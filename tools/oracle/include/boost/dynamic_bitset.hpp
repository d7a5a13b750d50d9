// Minimal drop-in replacement for boost::dynamic_bitset<> covering exactly the
// API surface used by the ribbit reference sources (see tools/oracle/build.sh).
// Written from scratch for the golden-parity oracle build; NOT derived from boost.
//
// Semantics matched to boost::dynamic_bitset:
//   - bit 0 is the least significant bit of block 0
//   - operator<< shifts toward higher bit indices; bits shifted past size()-1
//     are discarded; size() never changes
//   - count() counts set bits; unused high bits in the top block are kept zero
#ifndef ORACLE_BOOST_DYNAMIC_BITSET_HPP
#define ORACLE_BOOST_DYNAMIC_BITSET_HPP

#include <cstdint>
#include <cstddef>
#include <vector>
#include <stdexcept>

namespace boost {

template <typename Block = unsigned long>
class dynamic_bitset {
public:
    typedef std::size_t size_type;

private:
    size_type nbits_;
    std::vector<uint64_t> w_;

    static size_type nwords(size_type nbits) { return (nbits + 63) >> 6; }

    void sanitize() {
        if (nbits_ == 0) return;
        size_type rem = nbits_ & 63;
        if (rem) w_.back() &= ((~0ull) >> (64 - rem));
    }

public:
    class reference {
        uint64_t* word_;
        uint64_t mask_;
    public:
        reference(uint64_t* word, size_type bit) : word_(word), mask_(1ull << bit) {}
        operator bool() const { return (*word_ & mask_) != 0; }
        reference& operator=(bool v) {
            if (v) *word_ |= mask_; else *word_ &= ~mask_;
            return *this;
        }
        reference& operator=(const reference& other) { return (*this = bool(other)); }
        bool operator==(bool v) const { return bool(*this) == v; }
    };

    dynamic_bitset() : nbits_(0) {}
    explicit dynamic_bitset(size_type nbits, unsigned long long value = 0)
        : nbits_(nbits), w_(nwords(nbits), 0ull) {
        if (!w_.empty()) { w_[0] = value; sanitize(); }
    }

    size_type size() const { return nbits_; }

    bool operator[](size_type pos) const {
        return (w_[pos >> 6] >> (pos & 63)) & 1ull;
    }
    reference operator[](size_type pos) {
        return reference(&w_[pos >> 6], pos & 63);
    }

    bool test(size_type pos) const { return (*this)[pos]; }

    void reset() { for (auto& x : w_) x = 0ull; }

    dynamic_bitset& set(size_type pos, size_type len, bool val) {
        // boost signature: set(pos, len, val) sets bits [pos, pos+len)
        for (size_type i = 0; i < len; ++i) {
            size_type p = pos + i;
            if (val) w_[p >> 6] |= (1ull << (p & 63));
            else     w_[p >> 6] &= ~(1ull << (p & 63));
        }
        return *this;
    }

    size_type count() const {
        size_type c = 0;
        for (uint64_t x : w_) c += (size_type)__builtin_popcountll(x);
        return c;
    }

    unsigned long to_ulong() const {
        // boost throws if bits beyond ulong are set; the reference only calls
        // this on windows that fit (<= 64 bits of payload).
        for (size_type i = 1; i < w_.size(); ++i)
            if (w_[i]) throw std::overflow_error("dynamic_bitset::to_ulong overflow");
        return w_.empty() ? 0ul : (unsigned long)w_[0];
    }

    // ---- shifts ----
    dynamic_bitset& operator<<=(size_type n) {
        if (n >= nbits_) { reset(); return *this; }
        size_type wshift = n >> 6, bshift = n & 63;
        size_type nw = w_.size();
        if (bshift == 0) {
            for (size_type i = nw; i-- > wshift; ) w_[i] = w_[i - wshift];
        } else {
            for (size_type i = nw; i-- > wshift; ) {
                uint64_t hi = w_[i - wshift] << bshift;
                uint64_t lo = (i > wshift) ? (w_[i - wshift - 1] >> (64 - bshift)) : 0ull;
                w_[i] = hi | lo;
            }
        }
        for (size_type i = 0; i < wshift && i < nw; ++i) w_[i] = 0ull;
        sanitize();
        return *this;
    }

    dynamic_bitset& operator>>=(size_type n) {
        if (n >= nbits_) { reset(); return *this; }
        size_type wshift = n >> 6, bshift = n & 63;
        size_type nw = w_.size();
        if (bshift == 0) {
            for (size_type i = 0; i + wshift < nw; ++i) w_[i] = w_[i + wshift];
        } else {
            for (size_type i = 0; i + wshift < nw; ++i) {
                uint64_t lo = w_[i + wshift] >> bshift;
                uint64_t hi = (i + wshift + 1 < nw) ? (w_[i + wshift + 1] << (64 - bshift)) : 0ull;
                w_[i] = lo | hi;
            }
        }
        for (size_type i = (wshift > nw ? 0 : nw - wshift); i < nw; ++i) w_[i] = 0ull;
        sanitize();
        return *this;
    }

    dynamic_bitset operator<<(size_type n) const { dynamic_bitset r(*this); r <<= n; return r; }
    dynamic_bitset operator>>(size_type n) const { dynamic_bitset r(*this); r >>= n; return r; }

    // ---- bitwise ops (operands assumed same size, as in the reference) ----
    dynamic_bitset& operator&=(const dynamic_bitset& o) {
        for (size_type i = 0; i < w_.size(); ++i) w_[i] &= o.w_[i];
        return *this;
    }
    dynamic_bitset& operator|=(const dynamic_bitset& o) {
        for (size_type i = 0; i < w_.size(); ++i) w_[i] |= o.w_[i];
        return *this;
    }
    dynamic_bitset& operator^=(const dynamic_bitset& o) {
        for (size_type i = 0; i < w_.size(); ++i) w_[i] ^= o.w_[i];
        return *this;
    }

    dynamic_bitset operator~() const {
        dynamic_bitset r(*this);
        for (auto& x : r.w_) x = ~x;
        r.sanitize();
        return r;
    }

    friend dynamic_bitset operator&(dynamic_bitset a, const dynamic_bitset& b) { a &= b; return a; }
    friend dynamic_bitset operator|(dynamic_bitset a, const dynamic_bitset& b) { a |= b; return a; }
    friend dynamic_bitset operator^(dynamic_bitset a, const dynamic_bitset& b) { a ^= b; return a; }
};

} // namespace boost

#endif
