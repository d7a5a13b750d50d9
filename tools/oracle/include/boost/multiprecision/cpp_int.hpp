// Minimal drop-in replacement for boost::multiprecision::uint256_t covering the
// API surface used by the ribbit reference sources. Written from scratch for the
// golden-parity oracle build; NOT derived from boost.
#ifndef ORACLE_BOOST_MP_CPP_INT_HPP
#define ORACLE_BOOST_MP_CPP_INT_HPP

#include <cstdint>
#include <cstddef>
#include <functional>

namespace boost { namespace multiprecision {

struct uint256_t {
    // little-endian limbs: v[0] = least significant 64 bits
    uint64_t v[4];

    uint256_t() : v{0, 0, 0, 0} {}
    uint256_t(int x) : v{(uint64_t)(long long)x, 0, 0, 0} {
        if (x < 0) { v[1] = v[2] = v[3] = ~0ull; }
    }
    uint256_t(unsigned x) : v{x, 0, 0, 0} {}
    uint256_t(long x) : uint256_t((long long)x) {}
    uint256_t(long long x) : v{(uint64_t)x, 0, 0, 0} {
        if (x < 0) { v[1] = v[2] = v[3] = ~0ull; }
    }
    uint256_t(unsigned long x) : v{(uint64_t)x, 0, 0, 0} {}
    uint256_t(unsigned long long x) : v{(uint64_t)x, 0, 0, 0} {}

    uint256_t& operator<<=(unsigned n) {
        if (n >= 256) { v[0] = v[1] = v[2] = v[3] = 0; return *this; }
        unsigned ws = n >> 6, bs = n & 63;
        uint64_t r[4] = {0, 0, 0, 0};
        for (int i = 3; i >= 0; --i) {
            int src = i - (int)ws;
            if (src < 0) continue;
            r[i] = v[src] << bs;
            if (bs && src > 0) r[i] |= v[src - 1] >> (64 - bs);
        }
        for (int i = 0; i < 4; ++i) v[i] = r[i];
        return *this;
    }
    uint256_t& operator>>=(unsigned n) {
        if (n >= 256) { v[0] = v[1] = v[2] = v[3] = 0; return *this; }
        unsigned ws = n >> 6, bs = n & 63;
        uint64_t r[4] = {0, 0, 0, 0};
        for (int i = 0; i < 4; ++i) {
            unsigned src = i + ws;
            if (src > 3) continue;
            r[i] = v[src] >> bs;
            if (bs && src < 3) r[i] |= v[src + 1] << (64 - bs);
        }
        for (int i = 0; i < 4; ++i) v[i] = r[i];
        return *this;
    }

    friend uint256_t operator<<(uint256_t a, unsigned n) { a <<= n; return a; }
    friend uint256_t operator>>(uint256_t a, unsigned n) { a >>= n; return a; }
    friend uint256_t operator<<(uint256_t a, int n) { a <<= (unsigned)n; return a; }
    friend uint256_t operator>>(uint256_t a, int n) { a >>= (unsigned)n; return a; }

    uint256_t& operator|=(const uint256_t& o) { for (int i = 0; i < 4; ++i) v[i] |= o.v[i]; return *this; }
    uint256_t& operator&=(const uint256_t& o) { for (int i = 0; i < 4; ++i) v[i] &= o.v[i]; return *this; }
    uint256_t& operator^=(const uint256_t& o) { for (int i = 0; i < 4; ++i) v[i] ^= o.v[i]; return *this; }

    friend uint256_t operator|(uint256_t a, const uint256_t& b) { a |= b; return a; }
    friend uint256_t operator&(uint256_t a, const uint256_t& b) { a &= b; return a; }
    friend uint256_t operator^(uint256_t a, const uint256_t& b) { a ^= b; return a; }

    friend bool operator==(const uint256_t& a, const uint256_t& b) {
        return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] && a.v[3] == b.v[3];
    }
    friend bool operator!=(const uint256_t& a, const uint256_t& b) { return !(a == b); }
    friend bool operator<(const uint256_t& a, const uint256_t& b) {
        for (int i = 3; i >= 0; --i) {
            if (a.v[i] != b.v[i]) return a.v[i] < b.v[i];
        }
        return false;
    }
    friend bool operator>(const uint256_t& a, const uint256_t& b) { return b < a; }
    friend bool operator<=(const uint256_t& a, const uint256_t& b) { return !(b < a); }
    friend bool operator>=(const uint256_t& a, const uint256_t& b) { return !(a < b); }
};

}} // namespace boost::multiprecision

namespace std {
template <> struct hash<boost::multiprecision::uint256_t> {
    size_t operator()(const boost::multiprecision::uint256_t& x) const {
        uint64_t h = 1469598103934665603ull;
        for (int i = 0; i < 4; ++i) {
            h ^= x.v[i];
            h *= 1099511628211ull;
        }
        return (size_t)h;
    }
};
} // namespace std

#endif
