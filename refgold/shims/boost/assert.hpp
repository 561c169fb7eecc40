#ifndef SHIM_BOOST_ASSERT_HPP
#define SHIM_BOOST_ASSERT_HPP
#include <cassert>
#include <cstdio>
#include <cstdlib>
#define BOOST_ASSERT_MSG(expr, msg) \
    do { if (!(expr)) { std::fprintf(stderr, "assertion failed: %s\n", msg); std::abort(); } } while (0)
#define BOOST_ASSERT(expr) BOOST_ASSERT_MSG(expr, #expr)
#endif
