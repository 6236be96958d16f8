#ifndef CEREAL_STUB_TYPES_vector_HPP_
#define CEREAL_STUB_TYPES_vector_HPP_
#include "cereal/cereal.hpp"
#endif
