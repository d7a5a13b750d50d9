#!/bin/bash
# Builds the reference ribbit binary as a golden-parity oracle.
#
# The reference sources (mounted read-only at /root/reference) depend on boost
# (dynamic_bitset, multiprecision cpp_int, program_options), which is not
# available in this environment. We compile the reference sources out-of-tree
# against minimal from-scratch shim headers (tools/oracle/include/boost/*).
#
# The sources are copied to a throwaway build dir (never committed) because one
# file uses a VLA initializer `int a[N] = {-1};` that modern g++ rejects; the
# patch reproduces the semantics the original author's build had (first element
# -1, remaining elements zero-initialized), per parse_perfect_shiftxor.cpp:162-164.
set -euo pipefail

REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="${TMPDIR:-/tmp}/ribbit_oracle_build"
OUT="$HERE/ribbit_oracle"

if [ -x "$OUT" ] && [ "${1:-}" != "-f" ]; then
    echo "oracle already built at $OUT (use -f to force rebuild)"
    exit 0
fi

rm -rf "$BUILD"
mkdir -p "$BUILD"
cp "$REF"/*.cpp "$REF"/*.h "$REF"/ssw.c "$BUILD/"

# Replace the ill-formed VLA initializers with equivalent explicit init.
python3 - "$BUILD/parse_perfect_shiftxor.cpp" <<'EOF'
import re, sys
path = sys.argv[1]
src = open(path).read()
pat = re.compile(r"int (\w+)\[NMOTIFS\] = \{-1\};[^\n]*")
def repl(m):
    n = m.group(1)
    return (f"int {n}[NMOTIFS]; for (int _vla=0; _vla<NMOTIFS; _vla++) {n}[_vla] = 0; "
            f"{n}[0] = -1;  /* oracle: replicate `= {{-1}}` semantics */")
src2 = pat.sub(repl, src)
assert src2 != src, "VLA initializer pattern not found"
open(path, "w").write(src2)
EOF

cd "$BUILD"
g++ -O3 -w -std=gnu++17 -I "$HERE/include" \
    ssw.c ssw_cpp.cpp global_variables.cpp process_cigar.cpp parse_seed.cpp \
    parse_smallmotif_seed.cpp merge_types.cpp parse_anchored_shiftxor.cpp \
    parse_substitute_shiftxor.cpp parse_perfect_shiftxor.cpp bitseq_utils.cpp \
    fasta_utils.cpp ribbit.cpp -o "$OUT"

echo "built $OUT"
