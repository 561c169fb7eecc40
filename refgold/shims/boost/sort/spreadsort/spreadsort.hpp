#ifndef SHIM_BOOST_SPREADSORT_HPP
#define SHIM_BOOST_SPREADSORT_HPP
#include <cstring>
namespace boost { namespace sort { namespace spreadsort {
// Sign-corrected float-to-int bit cast used by radix comparators.
template <typename F, typename I> inline I float_mem_cast(F f) {
    I i; std::memcpy(&i, &f, sizeof(I));
    return i < 0 ? ~i | (I(1) << (sizeof(I) * 8 - 1)) : i;
}
}}}
#endif
