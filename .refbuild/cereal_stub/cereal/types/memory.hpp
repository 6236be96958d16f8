#ifndef CEREAL_STUB_TYPES_memory_HPP_
#define CEREAL_STUB_TYPES_memory_HPP_
#include "cereal/cereal.hpp"
#endif
