#ifndef CEREAL_STUB_TYPES_string_HPP_
#define CEREAL_STUB_TYPES_string_HPP_
#include "cereal/cereal.hpp"
#endif
