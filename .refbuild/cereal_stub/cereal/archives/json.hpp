#ifndef CEREAL_STUB_JSON_HPP_
#define CEREAL_STUB_JSON_HPP_
#include <iosfwd>
#include "cereal/cereal.hpp"
namespace cereal {
class JSONOutputArchive : public ArchiveBase {
public:
    explicit JSONOutputArchive(std::ostream&) {}
};
class JSONInputArchive : public ArchiveBase {
public:
    explicit JSONInputArchive(std::istream&) {}
};
namespace traits {
template <>
struct is_text_archive<JSONOutputArchive> { static const bool value = true; };
template <>
struct is_text_archive<JSONInputArchive> { static const bool value = true; };
}
}
#endif
