#ifndef SHIM_GLM_EXT_HPP
#define SHIM_GLM_EXT_HPP
#include "glm.hpp"
#include "gtc/constants.hpp"
#include "gtx/string_cast.hpp"
#endif
