#ifndef CEREAL_STUB_TYPES_set_HPP_
#define CEREAL_STUB_TYPES_set_HPP_
#include "cereal/cereal.hpp"
#endif
