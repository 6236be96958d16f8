#ifndef CEREAL_STUB_TYPES_complex_HPP_
#define CEREAL_STUB_TYPES_complex_HPP_
#include "cereal/cereal.hpp"
#endif
