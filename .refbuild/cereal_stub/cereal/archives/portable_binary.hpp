#ifndef CEREAL_STUB_PB_HPP_
#define CEREAL_STUB_PB_HPP_
#include <iosfwd>
#include "cereal/cereal.hpp"
namespace cereal {
class PortableBinaryOutputArchive : public ArchiveBase {
public:
    explicit PortableBinaryOutputArchive(std::ostream&) {}
};
class PortableBinaryInputArchive : public ArchiveBase {
public:
    explicit PortableBinaryInputArchive(std::istream&) {}
};
class BinaryOutputArchive : public ArchiveBase {
public:
    explicit BinaryOutputArchive(std::ostream&) {}
};
class BinaryInputArchive : public ArchiveBase {
public:
    explicit BinaryInputArchive(std::istream&) {}
};
}
#endif
