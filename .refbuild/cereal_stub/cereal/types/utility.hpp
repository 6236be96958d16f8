#ifndef CEREAL_STUB_TYPES_utility_HPP_
#define CEREAL_STUB_TYPES_utility_HPP_
#include "cereal/cereal.hpp"
#endif
