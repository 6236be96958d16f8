#ifndef CEREAL_STUB_TYPES_base_class_HPP_
#define CEREAL_STUB_TYPES_base_class_HPP_
#include "cereal/cereal.hpp"
#endif
