#ifndef CEREAL_STUB_TYPES_list_HPP_
#define CEREAL_STUB_TYPES_list_HPP_
#include "cereal/cereal.hpp"
#endif
