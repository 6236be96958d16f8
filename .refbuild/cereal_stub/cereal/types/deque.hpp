#ifndef CEREAL_STUB_TYPES_deque_HPP_
#define CEREAL_STUB_TYPES_deque_HPP_
#include "cereal/cereal.hpp"
#endif
