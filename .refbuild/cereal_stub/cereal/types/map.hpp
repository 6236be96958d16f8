#ifndef CEREAL_STUB_TYPES_map_HPP_
#define CEREAL_STUB_TYPES_map_HPP_
#include "cereal/cereal.hpp"
#endif
