#ifndef CEREAL_STUB_TYPES_tuple_HPP_
#define CEREAL_STUB_TYPES_tuple_HPP_
#include "cereal/cereal.hpp"
#endif
