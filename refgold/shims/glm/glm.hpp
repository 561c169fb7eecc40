// Minimal glm-compatible vector-math header, written from scratch for
// building the MobileRT reference engine offline (the real glm submodule
// is not vendored and there is no network).  Implements exactly the API
// surface the reference uses: vec2/vec3, dot/cross/normalize/length,
// reflect/refract, fract, min/max/clamp, isnan/isinf/all/any/greaterThan,
// equal.  Semantics follow the GLSL spec the way glm documents them.
#ifndef SHIM_GLM_GLM_HPP
#define SHIM_GLM_GLM_HPP

#include <cmath>
#include <cstdint>
#include <cstring>  // the reference's Utils.cpp uses std::strerror via us

namespace glm {

template <int L, typename T> struct vec;

template <typename T> struct vec<2, T> {
    T x {}, y {};
    constexpr vec() = default;
    constexpr explicit vec(T s) : x {s}, y {s} {}
    constexpr vec(T a, T b) : x {a}, y {b} {}
    template <typename U>
    constexpr explicit vec(const vec<2, U> &o)
        : x {static_cast<T>(o.x)}, y {static_cast<T>(o.y)} {}
    T &operator[](int i) { return i == 0 ? x : y; }
    const T &operator[](int i) const { return i == 0 ? x : y; }
};

template <typename T> struct vec<3, T> {
    T x {}, y {}, z {};
    constexpr vec() = default;
    constexpr explicit vec(T s) : x {s}, y {s}, z {s} {}
    constexpr vec(T a, T b, T c) : x {a}, y {b}, z {c} {}
    template <typename U>
    constexpr explicit vec(const vec<3, U> &o)
        : x {static_cast<T>(o.x)}, y {static_cast<T>(o.y)},
          z {static_cast<T>(o.z)} {}
    T &operator[](int i) { return i == 0 ? x : (i == 1 ? y : z); }
    const T &operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

using vec2 = vec<2, float>;
using vec3 = vec<3, float>;
using bvec2 = vec<2, bool>;
using bvec3 = vec<3, bool>;

// --- arithmetic -----------------------------------------------------------
template <typename T> inline vec<2, T> operator+(const vec<2, T> &a, const vec<2, T> &b) { return {a.x + b.x, a.y + b.y}; }
template <typename T> inline vec<2, T> operator-(const vec<2, T> &a, const vec<2, T> &b) { return {a.x - b.x, a.y - b.y}; }
template <typename T> inline vec<2, T> operator*(const vec<2, T> &a, const vec<2, T> &b) { return {a.x * b.x, a.y * b.y}; }
template <typename T> inline vec<2, T> operator*(const vec<2, T> &a, T s) { return {a.x * s, a.y * s}; }
template <typename T> inline vec<2, T> operator*(T s, const vec<2, T> &a) { return {s * a.x, s * a.y}; }
template <typename T> inline vec<2, T> operator/(const vec<2, T> &a, T s) { return {a.x / s, a.y / s}; }
template <typename T> inline vec<2, T> operator-(const vec<2, T> &a) { return {-a.x, -a.y}; }

template <typename T> inline vec<3, T> operator+(const vec<3, T> &a, const vec<3, T> &b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
template <typename T> inline vec<3, T> operator-(const vec<3, T> &a, const vec<3, T> &b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
template <typename T> inline vec<3, T> operator*(const vec<3, T> &a, const vec<3, T> &b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
template <typename T> inline vec<3, T> operator/(const vec<3, T> &a, const vec<3, T> &b) { return {a.x / b.x, a.y / b.y, a.z / b.z}; }
template <typename T> inline vec<3, T> operator*(const vec<3, T> &a, T s) { return {a.x * s, a.y * s, a.z * s}; }
template <typename T> inline vec<3, T> operator*(T s, const vec<3, T> &a) { return {s * a.x, s * a.y, s * a.z}; }
template <typename T> inline vec<3, T> operator/(const vec<3, T> &a, T s) { return {a.x / s, a.y / s, a.z / s}; }
template <typename T> inline vec<3, T> operator/(T s, const vec<3, T> &a) { return {s / a.x, s / a.y, s / a.z}; }
template <typename T> inline vec<3, T> operator-(const vec<3, T> &a) { return {-a.x, -a.y, -a.z}; }

template <typename T> inline vec<2, T> &operator+=(vec<2, T> &a, const vec<2, T> &b) { a = a + b; return a; }
template <typename T> inline vec<3, T> &operator+=(vec<3, T> &a, const vec<3, T> &b) { a = a + b; return a; }
template <typename T> inline vec<3, T> &operator-=(vec<3, T> &a, const vec<3, T> &b) { a = a - b; return a; }
template <typename T> inline vec<3, T> &operator*=(vec<3, T> &a, const vec<3, T> &b) { a = a * b; return a; }
template <typename T> inline vec<3, T> &operator*=(vec<3, T> &a, T s) { a = a * s; return a; }
template <typename T> inline vec<3, T> &operator/=(vec<3, T> &a, T s) { a = a / s; return a; }

// glm allows mixed vec-float / vec-int scalar arithmetic; the reference uses
// `vec3 /= int32` (shaders) and `vec3 +- float` (Sphere::getAABB).
template <typename T, typename S> inline vec<3, T> operator+(const vec<3, T> &a, S s) { return {a.x + static_cast<T>(s), a.y + static_cast<T>(s), a.z + static_cast<T>(s)}; }
template <typename T, typename S> inline vec<3, T> operator-(const vec<3, T> &a, S s) { return {a.x - static_cast<T>(s), a.y - static_cast<T>(s), a.z - static_cast<T>(s)}; }
template <typename T> inline vec<3, T> &operator/=(vec<3, T> &a, std::int32_t s) { a = a / static_cast<T>(s); return a; }

template <typename T> inline bool operator==(const vec<2, T> &a, const vec<2, T> &b) { return a.x == b.x && a.y == b.y; }
template <typename T> inline bool operator==(const vec<3, T> &a, const vec<3, T> &b) { return a.x == b.x && a.y == b.y && a.z == b.z; }
template <typename T> inline bool operator!=(const vec<3, T> &a, const vec<3, T> &b) { return !(a == b); }

// --- geometric ------------------------------------------------------------
template <typename T> inline T dot(const vec<2, T> &a, const vec<2, T> &b) { return a.x * b.x + a.y * b.y; }
template <typename T> inline T dot(const vec<3, T> &a, const vec<3, T> &b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

template <typename T> inline vec<3, T> cross(const vec<3, T> &a, const vec<3, T> &b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

template <typename T> inline T length(const vec<2, T> &a) { return std::sqrt(dot(a, a)); }
template <typename T> inline T length(const vec<3, T> &a) { return std::sqrt(dot(a, a)); }

template <int L, typename T> inline vec<L, T> normalize(const vec<L, T> &a) {
    // glm computes v * inversesqrt(dot(v, v)).
    return a * (T {1} / std::sqrt(dot(a, a)));
}

// GLSL reflect: I - 2 * dot(N, I) * N.
template <typename T> inline vec<3, T> reflect(const vec<3, T> &i, const vec<3, T> &n) {
    return i - n * (T {2} * dot(n, i));
}

// GLSL refract; returns the zero vector on total internal reflection.
template <typename T> inline vec<3, T> refract(const vec<3, T> &i, const vec<3, T> &n, T eta) {
    const T d {dot(n, i)};
    const T k {T {1} - eta * eta * (T {1} - d * d)};
    if (k < T {0}) {
        return vec<3, T> {T {0}};
    }
    return i * eta - n * (eta * d + std::sqrt(k));
}

// --- componentwise --------------------------------------------------------
template <typename T> inline T min(T a, T b) { return b < a ? b : a; }
template <typename T> inline T max(T a, T b) { return a < b ? b : a; }
template <typename T> inline vec<2, T> min(const vec<2, T> &a, const vec<2, T> &b) { return {min(a.x, b.x), min(a.y, b.y)}; }
template <typename T> inline vec<2, T> max(const vec<2, T> &a, const vec<2, T> &b) { return {max(a.x, b.x), max(a.y, b.y)}; }
template <typename T> inline vec<3, T> min(const vec<3, T> &a, const vec<3, T> &b) { return {min(a.x, b.x), min(a.y, b.y), min(a.z, b.z)}; }
template <typename T> inline vec<3, T> max(const vec<3, T> &a, const vec<3, T> &b) { return {max(a.x, b.x), max(a.y, b.y), max(a.z, b.z)}; }

template <typename T> inline T clamp(T x, T lo, T hi) { return min(max(x, lo), hi); }

template <typename T> inline T fract(T x) { return x - std::floor(x); }
template <typename T> inline vec<2, T> fract(const vec<2, T> &a) { return {fract(a.x), fract(a.y)}; }
template <typename T> inline vec<3, T> fract(const vec<3, T> &a) { return {fract(a.x), fract(a.y), fract(a.z)}; }

template <typename T> inline vec<2, T> abs(const vec<2, T> &a) { return {std::abs(a.x), std::abs(a.y)}; }
template <typename T> inline vec<3, T> abs(const vec<3, T> &a) { return {std::abs(a.x), std::abs(a.y), std::abs(a.z)}; }

// --- relational -----------------------------------------------------------
template <typename T> inline vec<2, bool> isnan(const vec<2, T> &a) { return {std::isnan(a.x), std::isnan(a.y)}; }
template <typename T> inline vec<3, bool> isnan(const vec<3, T> &a) { return {std::isnan(a.x), std::isnan(a.y), std::isnan(a.z)}; }
template <typename T> inline vec<2, bool> isinf(const vec<2, T> &a) { return {std::isinf(a.x), std::isinf(a.y)}; }
template <typename T> inline vec<3, bool> isinf(const vec<3, T> &a) { return {std::isinf(a.x), std::isinf(a.y), std::isinf(a.z)}; }

template <typename T> inline vec<2, bool> greaterThan(const vec<2, T> &a, const vec<2, T> &b) { return {a.x > b.x, a.y > b.y}; }
template <typename T> inline vec<3, bool> greaterThan(const vec<3, T> &a, const vec<3, T> &b) { return {a.x > b.x, a.y > b.y, a.z > b.z}; }

template <typename T> inline vec<2, bool> equal(const vec<2, T> &a, const vec<2, T> &b) { return {a.x == b.x, a.y == b.y}; }
template <typename T> inline vec<3, bool> equal(const vec<3, T> &a, const vec<3, T> &b) { return {a.x == b.x, a.y == b.y, a.z == b.z}; }

inline bool all(const vec<2, bool> &a) { return a.x && a.y; }
inline bool all(const vec<3, bool> &a) { return a.x && a.y && a.z; }
inline bool any(const vec<2, bool> &a) { return a.x || a.y; }
inline bool any(const vec<3, bool> &a) { return a.x || a.y || a.z; }

} // namespace glm

#endif // SHIM_GLM_GLM_HPP
