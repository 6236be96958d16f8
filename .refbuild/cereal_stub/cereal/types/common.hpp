#ifndef CEREAL_STUB_TYPES_common_HPP_
#define CEREAL_STUB_TYPES_common_HPP_
#include "cereal/cereal.hpp"
#endif
