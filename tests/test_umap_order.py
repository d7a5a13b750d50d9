"""The BED emission order of the small-motif path depends on libstdc++'s
unordered_map iteration order (parse_smallmotif_seed.cpp:177-187).  Both the
Python simulation (umap_order.py) and the C port (ribbit_refine.c) must
reproduce the real g++ _Hashtable order exactly."""

import ctypes
import random
import shutil
import subprocess

import numpy as np
import pytest

CPP = r"""
#include <unordered_map>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
int main(int argc, char **argv) {
    std::unordered_map<uint32_t, int> m;
    for (int i = 1; i < argc; i++) m[(uint32_t)strtoul(argv[i], 0, 10)] = i;
    for (auto &kv : m) printf("%u ", kv.first);
    return 0;
}
"""


@pytest.fixture(scope="module")
def umap_ref(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    d = tmp_path_factory.mktemp("umap")
    src = d / "umap_ref.cpp"
    src.write_text(CPP)
    exe = d / "umap_ref"
    r = subprocess.run(["g++", "-O2", "-o", str(exe), str(src)],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip("g++ compile failed")
    return exe


def _ground_truth(exe, keys):
    out = subprocess.run([str(exe)] + [str(k) for k in keys],
                         capture_output=True, text=True).stdout.split()
    return [int(x) for x in out]


def test_python_simulation_matches_gxx(umap_ref):
    from ribbit_tpu.umap_order import libstdcxx_order
    rng = random.Random(7)
    for _ in range(40):
        n = rng.randint(1, 250)
        keys = rng.sample(range(1 << 20), n)
        assert libstdcxx_order(keys) == _ground_truth(umap_ref, keys)


def test_c_port_matches_gxx(umap_ref):
    from ribbit_tpu.core import get_core_lib
    lib = get_core_lib()
    if lib is None:
        pytest.skip("native core unavailable")
    P64 = ctypes.POINTER(ctypes.c_int64)
    lib.ribbit_umap_order.restype = None
    lib.ribbit_umap_order.argtypes = [P64, ctypes.c_int64, P64]
    rng = random.Random(8)
    for _ in range(40):
        n = rng.randint(1, 250)
        keys = rng.sample(range(1 << 20), n)
        ka = np.array(keys, dtype=np.int64)
        out = np.zeros(n, dtype=np.int64)
        lib.ribbit_umap_order(ka.ctypes.data_as(P64), n,
                              out.ctypes.data_as(P64))
        assert out.tolist() == _ground_truth(umap_ref, keys)
