// Minimal cereal API stub — just enough to COMPILE the OpenFHE reference libs
// for baseline benchmarking. Serialization is never exercised by the benchmark
// harness; archive bodies throw if ever invoked.
#ifndef CEREAL_STUB_CEREAL_HPP_
#define CEREAL_STUB_CEREAL_HPP_

#include <cstdint>
#include <iostream>
#include <stdexcept>
#include <string>
#include <utility>

#define CEREAL_SAVE_FUNCTION_NAME save
#define CEREAL_LOAD_FUNCTION_NAME load
#define CEREAL_SERIALIZE_FUNCTION_NAME serialize

#define CEREAL_CLASS_VERSION(TYPE, VERSION)
#define CEREAL_NVP(T) ::cereal::make_nvp(#T, T)

namespace cereal {

using size_type = std::uint64_t;

class Exception : public std::runtime_error {
public:
    explicit Exception(const std::string& w) : std::runtime_error(w) {}
    explicit Exception(const char* w) : std::runtime_error(w) {}
};

template <class T>
struct NameValuePair {
    const char* name;
    T value;
    NameValuePair(const char* n, T&& v) : name(n), value(std::forward<T>(v)) {}
};

template <class T>
inline NameValuePair<T> make_nvp(const char* name, T&& value) {
    return NameValuePair<T>(name, std::forward<T>(value));
}
template <class T>
inline NameValuePair<T> make_nvp(const std::string& name, T&& value) {
    return NameValuePair<T>(name.c_str(), std::forward<T>(value));
}

template <class T>
struct SizeTag {
    T size;
};
template <class T>
inline SizeTag<T> make_size_tag(T&& size) {
    return SizeTag<T>{std::forward<T>(size)};
}

template <class Base>
struct BaseClassWrapper {
    Base* base_ptr;
};
template <class Base, class Derived>
inline BaseClassWrapper<Base> base_class(const Derived* d) {
    return BaseClassWrapper<Base>{const_cast<Base*>(static_cast<const Base*>(d))};
}
template <class Base, class Derived>
inline BaseClassWrapper<Base> virtual_base_class(const Derived* d) {
    return BaseClassWrapper<Base>{const_cast<Base*>(static_cast<const Base*>(d))};
}

template <class T>
struct BinaryData {
    T* data;
    size_type size;
};
template <class T>
inline BinaryData<T> binary_data(T* d, std::size_t size) {
    return BinaryData<T>{d, static_cast<size_type>(size)};
}

struct access {
    template <class Archive, class T>
    static void member_serialize(Archive& ar, T& t) {
        t.serialize(ar);
    }
};

class ArchiveBase {
public:
    template <class... Types>
    void operator()(Types&&...) {
        throw Exception("cereal stub: serialization not available in baseline build");
    }
};

namespace traits {
template <class Archive>
struct is_text_archive {
    static const bool value = false;
};
}  // namespace traits

}  // namespace cereal

#endif
