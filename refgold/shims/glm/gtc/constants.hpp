#ifndef SHIM_GLM_GTC_CONSTANTS_HPP
#define SHIM_GLM_GTC_CONSTANTS_HPP
namespace glm {
template <typename T> constexpr T pi() { return T(3.14159265358979323846264338327950288L); }
template <typename T> constexpr T two_pi() { return T(2) * pi<T>(); }
template <typename T> constexpr T half_pi() { return pi<T>() / T(2); }
template <typename T> constexpr T quarter_pi() { return pi<T>() / T(4); }
}
#endif
