// Minimal pcg-cpp-compatible shim for building the reference headlessly.
// Implements the standard PCG-XSH-RR 64/32 generator (public algorithm,
// O'Neill 2014) with just the API surface the reference uses:
//   pcg32 (UniformRandomBitGenerator) and pcg_extras::seed_seq_from<T>.
#ifndef REFGOLD_PCG_RANDOM_SHIM_HPP
#define REFGOLD_PCG_RANDOM_SHIM_HPP

#include <cstdint>

namespace pcg_extras {

// Adapter: wraps a random device so it can be consumed like a seed source.
template <typename RngT>
class seed_seq_from {
public:
    seed_seq_from() = default;
    std::uint64_t next() {
        return (static_cast<std::uint64_t>(rng_()) << 32) ^
               static_cast<std::uint64_t>(rng_());
    }

private:
    RngT rng_ {};
};

}  // namespace pcg_extras

class pcg32 {
public:
    using result_type = std::uint32_t;

    pcg32() { seed(0x853c49e6748fea9bULL, 0xda3e39cb94b95bdbULL); }

    template <typename SeedSource>
    explicit pcg32(SeedSource &src) {
        seed(src.next(), src.next() | 1ULL);
    }

    void seed(std::uint64_t initstate, std::uint64_t initseq) {
        state_ = 0U;
        inc_ = (initseq << 1U) | 1U;
        operator()();
        state_ += initstate;
        operator()();
    }

    result_type operator()() {
        const std::uint64_t oldstate {state_};
        state_ = oldstate * 6364136223846793005ULL + inc_;
        const std::uint32_t xorshifted {
            static_cast<std::uint32_t>(((oldstate >> 18U) ^ oldstate) >> 27U)};
        const std::uint32_t rot {static_cast<std::uint32_t>(oldstate >> 59U)};
        return (xorshifted >> rot) | (xorshifted << ((32U - rot) & 31U));
    }

    static constexpr result_type min() { return 0U; }
    static constexpr result_type max() { return 0xFFFFFFFFU; }

private:
    std::uint64_t state_ {};
    std::uint64_t inc_ {};
};

#endif  // REFGOLD_PCG_RANDOM_SHIM_HPP
