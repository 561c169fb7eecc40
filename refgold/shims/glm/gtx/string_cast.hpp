#ifndef SHIM_GLM_GTX_STRING_CAST_HPP
#define SHIM_GLM_GTX_STRING_CAST_HPP
#include <sstream>
#include <string>
#include "../glm.hpp"
namespace glm {
template <typename T> inline std::string to_string(const vec<2, T> &v) {
    std::ostringstream o; o << "vec2(" << v.x << ", " << v.y << ")"; return o.str();
}
template <typename T> inline std::string to_string(const vec<3, T> &v) {
    std::ostringstream o; o << "vec3(" << v.x << ", " << v.y << ", " << v.z << ")"; return o.str();
}
}
#endif
