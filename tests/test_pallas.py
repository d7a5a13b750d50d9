"""Pallas scan kernel vs the host reference (interpret mode on the CPU
mesh; the same kernel compiles for TPU via Mosaic)."""

import numpy as np

from ribbit_tpu.config import RibbitConfig


def test_pallas_scan_matches_host(cpu_jax):
    from ribbit_tpu import scan_host
    from ribbit_tpu.scan_pallas import scan_arrays_pallas
    from ribbit_tpu.encode import encode
    from ribbit_tpu.sim import simulate

    cfg = RibbitConfig.create()
    sim = simulate(num_loci=2, seed=66, name="pl", n_block_rate=0.4)
    code, n_mask = encode(sim.sequence)
    L = code.shape[0]

    eq_p, sum8_p = scan_arrays_pallas(code, cfg, interpret=True)
    eq_h = scan_host.match_bitmaps(code, cfg)
    assert np.array_equal(eq_p, eq_h)

    cs = np.cumsum(eq_h.astype(np.int32), axis=1)
    nw = L - 8 + 1
    win = cs[:, 7:].copy()
    win[:, 1:] -= cs[:, :nw - 1]
    assert np.array_equal(sum8_p[:, :nw], win)


def test_pallas_scan_small_motif_range(cpu_jax):
    from ribbit_tpu import scan_host
    from ribbit_tpu.scan_pallas import scan_arrays_pallas
    from ribbit_tpu.encode import encode

    rng = np.random.default_rng(4)
    cfg = RibbitConfig.create(min_motif=5, max_motif=30)
    code = rng.integers(0, 4, 700).astype(np.int8)
    eq_p, _ = scan_arrays_pallas(code, cfg, interpret=True)
    eq_h = scan_host.match_bitmaps(code, cfg)
    assert np.array_equal(eq_p, eq_h)


def test_pallas_full_generation_bed_parity(cpu_jax, golden_dir):
    """The complete Pallas generation (anchors, overlay, qualified windows,
    perfect flags) must drive the native core to oracle-identical BED."""
    from ribbit_tpu.fasta import read_fasta
    from ribbit_tpu.encode import encode
    from ribbit_tpu.core import CoreSession
    from ribbit_tpu.scan_pallas_full import scan_events_via_pallas
    from ribbit_tpu.config import RibbitConfig

    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g3.fa")):
        code, n_mask = encode(seq)
        sess = CoreSession(code, n_mask, cfg)
        try:
            sess.set_events(*scan_events_via_pallas(code, n_mask, cfg,
                                                    interpret=True))
            seeds = sess.scan()
            lines += sess.refine(seeds, seq, sid)
        finally:
            sess.close()
    expected = (golden_dir / "g3.oracle.bed").read_text().splitlines()
    assert lines == expected


def test_pallas_v2_matches_v1(cpu_jax):
    """The sublane-parallel all-channel kernel (scan_pallas_v2) must be
    bit-equal to the proven per-group v1 masks on default and shifted
    motif ranges, including N runs and sequence tails."""
    from ribbit_tpu.encode import encode
    from ribbit_tpu.sim import simulate
    from ribbit_tpu.scan_pallas_full import generate_masks_pallas
    from ribbit_tpu.scan_pallas_v2 import generate_masks_pallas_v2

    for cfg, seed in ((RibbitConfig.create(), 7),
                      (RibbitConfig.create(min_motif=4, max_motif=37), 8)):
        sim = simulate(num_loci=2, seed=seed, name="v2", n_block_rate=0.5)
        code, n_mask = encode(sim.sequence)
        v1 = generate_masks_pallas(code, n_mask, cfg, interpret=True)
        v2 = generate_masks_pallas_v2(code, n_mask, cfg, interpret=True)
        for a, b in zip(v1, v2):
            assert np.array_equal(np.asarray(a, np.int8), np.asarray(b))


def test_pallas_v3_matches_v1(cpu_jax):
    """The manual-DMA kernel (scan_pallas_v3: HBM-resident inputs streamed
    through a double-buffered VMEM scratch, TILE=2048) must be bit-equal
    to the proven per-group v1 masks on default and shifted motif ranges,
    including N runs and sequence tails."""
    from ribbit_tpu.encode import encode
    from ribbit_tpu.sim import simulate
    from ribbit_tpu.scan_pallas_full import generate_masks_pallas
    from ribbit_tpu.scan_pallas_v3 import generate_masks_pallas_v3

    for cfg, seed in ((RibbitConfig.create(), 7),
                      (RibbitConfig.create(min_motif=4, max_motif=37), 8)):
        sim = simulate(num_loci=2, seed=seed, name="v3", n_block_rate=0.5)
        code, n_mask = encode(sim.sequence)
        v1 = generate_masks_pallas(code, n_mask, cfg, interpret=True)
        v3 = generate_masks_pallas_v3(code, n_mask, cfg, interpret=True)
        for a, b in zip(v1, v3):
            assert np.array_equal(np.asarray(a, np.int8), np.asarray(b))


def test_pallas_v4_matches_v1(cpu_jax):
    """The row-split manual-DMA kernel (scan_pallas_v4: OUT_ROWS shift rows
    + 2-row overlay halo per program, host drops the halo rows) must be
    bit-equal to the proven per-group v1 masks on default and shifted motif
    ranges, including N runs, sequence tails, and the row-window edges
    where the overlay roll wraps.

    The interpret run patches TILE down to 8192 (interpret cost scales
    with EXT): the kernel algebra and the dependency-cone exactness
    argument are TILE-independent, and the shipped TILE=32768 config is
    separately pinned by test_pallas_v4_shipped_geometry_matches_v1.
    The anchor pass lives in scan_events_pallas (round-6 two-pass
    design), so BOTH modules' geometry is patched together."""
    import ribbit_tpu.scan_events_pallas as ev
    import ribbit_tpu.scan_pallas_v4 as m
    from ribbit_tpu.encode import encode
    from ribbit_tpu.sim import simulate
    from ribbit_tpu.scan_pallas_full import generate_masks_pallas
    from ribbit_tpu.scan_pallas_v4 import generate_masks_pallas_v4

    saved = (m.TILE, m.EXT, m.CHUNK, ev.TILE, ev.EXT, ev.CHUNK)
    m.TILE = ev.TILE = 8192
    m.EXT = m.LPAD + m.TILE + m.CAP + 128
    m.CHUNK = m.LPAD + m.TILE + m.RPAD
    ev.EXT = ev.LPAD + ev.TILE + ev.CAP + 128
    ev.CHUNK = ev.LPAD + ev.TILE + ev.RPAD
    try:
        for cfg, seed in ((RibbitConfig.create(), 7),
                          (RibbitConfig.create(min_motif=4, max_motif=37), 8)):
            sim = simulate(num_loci=2, seed=seed, name="v4", n_block_rate=0.5)
            code, n_mask = encode(sim.sequence)
            v1 = generate_masks_pallas(code, n_mask, cfg, interpret=True)
            v4 = generate_masks_pallas_v4(code, n_mask, cfg, interpret=True)
            for a, b in zip(v1, v4):
                assert np.array_equal(np.asarray(a, np.int8), np.asarray(b))
    finally:
        m.TILE, m.EXT, m.CHUNK, ev.TILE, ev.EXT, ev.CHUNK = saved
        # _scan_rows traces capture the module globals; drop them so no
        # later same-process caller reuses an 8192-geometry trace
        import jax
        jax.clear_caches()


def test_pallas_v4_shipped_geometry_matches_v1(cpu_jax):
    """The UNPATCHED shipped v4 geometry (TILE=32768, EXT/CHUNK as the
    module computes them from CAP/LPAD/RPAD) must be bit-equal to the
    proven v1 masks.  Complements test_pallas_v4_matches_v1, whose
    interpret run patches TILE down for speed: this one exercises exactly
    the configuration the production kernel compiles, so a geometry-
    constant change can never ship untested again (~16 s, one cfg)."""
    import ribbit_tpu.scan_pallas_v4 as m
    from ribbit_tpu.encode import encode
    from ribbit_tpu.sim import simulate
    from ribbit_tpu.scan_pallas_full import generate_masks_pallas
    from ribbit_tpu.scan_pallas_v4 import generate_masks_pallas_v4

    assert m.TILE == 32768          # pin the shipped geometry
    assert m.EXT == m.LPAD + m.TILE + m.CAP + 128
    assert m.CHUNK == m.LPAD + m.TILE + m.RPAD
    cfg = RibbitConfig.create()
    sim = simulate(num_loci=2, seed=7, name="v4g", n_block_rate=0.5)
    code, n_mask = encode(sim.sequence)
    v1 = generate_masks_pallas(code, n_mask, cfg, interpret=True)
    v4 = generate_masks_pallas_v4(code, n_mask, cfg, interpret=True)
    for a, b in zip(v1, v4):
        assert np.array_equal(np.asarray(a, np.int8), np.asarray(b))


def test_pallas_batched_ssw_forward(cpu_jax):
    """The batched SSW forward kernel must match the reference engine's
    score/end positions in both full-scan and reverse-terminate modes."""
    import numpy as np
    from ribbit_tpu.align import translate, _forward_pass
    from ribbit_tpu.align_pallas import batch_forward

    rng = np.random.default_rng(6)
    bases = "ACGTN"
    reads, refs = [], []
    for t in range(24):
        n1 = int(rng.integers(3, 160))
        n2 = int(rng.integers(3, 180))
        if t % 2 == 0:
            motif = "".join(bases[i] for i in rng.integers(0, 4,
                                                           int(rng.integers(2, 12))))
            q = list((motif * 40)[:n1])
            for k in rng.integers(0, max(1, len(q)), max(1, n1 // 8)):
                q[int(k)] = bases[int(rng.integers(0, 5))]
            reads.append(translate("".join(q)))
            refs.append(translate((motif * 60)[:n2]))
        else:
            reads.append(translate("".join(bases[i] for i in rng.integers(0, 5, n1))))
            refs.append(translate("".join(bases[i] for i in rng.integers(0, 5, n2))))

    score, end_ref, end_read, _ = batch_forward(reads, refs, interpret=True)
    for i in range(len(reads)):
        b, er, bc, _mc = _forward_pass(reads[i], refs[i])
        assert score[i] == b and end_ref[i] == er
        if er >= 0:
            assert end_read[i] == int(np.flatnonzero(bc == b)[0])

    # reverse-terminate mode on the located prefixes
    terms = [int(score[i]) if end_ref[i] >= 0 else None for i in range(len(reads))]
    rr = [reads[i][:int(end_read[i]) + 1][::-1].copy() if end_ref[i] >= 0
          else reads[i] for i in range(len(reads))]
    fr = [refs[i][:int(end_ref[i]) + 1][::-1].copy() if end_ref[i] >= 0
          else refs[i] for i in range(len(reads))]
    _s2, _er2, erd2, hit2 = batch_forward(rr, fr, terms, interpret=True)
    for i in range(len(reads)):
        if end_ref[i] < 0:
            continue
        _b, err, bcr, _ = _forward_pass(rr[i], fr[i], terminate=terms[i])
        assert hit2[i] == err
        assert erd2[i] == int(np.flatnonzero(bcr == terms[i])[0])


def test_pallas_batched_ssw_forward_v3(cpu_jax):
    """The 8-row-unrolled v3 SSW kernel must match the host spec in both
    full-scan and reverse-terminate modes (same contract as v1/v2)."""
    import numpy as np
    from ribbit_tpu.align import translate, _forward_pass
    from ribbit_tpu.align_pallas_v3 import batch_forward

    rng = np.random.default_rng(11)
    bases = "ACGTN"
    reads, refs = [], []
    for t in range(24):
        n1 = int(rng.integers(3, 160))
        n2 = int(rng.integers(3, 180))
        if t % 2 == 0:
            motif = "".join(bases[i] for i in rng.integers(0, 4,
                                                           int(rng.integers(2, 12))))
            q = list((motif * 40)[:n1])
            for k in rng.integers(0, max(1, len(q)), max(1, n1 // 8)):
                q[int(k)] = bases[int(rng.integers(0, 5))]
            reads.append(translate("".join(q)))
            refs.append(translate((motif * 60)[:n2]))
        else:
            reads.append(translate("".join(bases[i] for i in rng.integers(0, 5, n1))))
            refs.append(translate("".join(bases[i] for i in rng.integers(0, 5, n2))))

    score, end_ref, end_read, _ = batch_forward(reads, refs, interpret=True)
    for i in range(len(reads)):
        b, er, bc, _mc = _forward_pass(reads[i], refs[i])
        assert score[i] == b and end_ref[i] == er
        if er >= 0:
            assert end_read[i] == int(np.flatnonzero(bc == b)[0])

    terms = [int(score[i]) if end_ref[i] >= 0 else None for i in range(len(reads))]
    rr = [reads[i][:int(end_read[i]) + 1][::-1].copy() if end_ref[i] >= 0
          else reads[i] for i in range(len(reads))]
    fr = [refs[i][:int(end_ref[i]) + 1][::-1].copy() if end_ref[i] >= 0
          else refs[i] for i in range(len(reads))]
    _s2, _er2, erd2, hit2 = batch_forward(rr, fr, terms, interpret=True)
    for i in range(len(reads)):
        if end_ref[i] < 0:
            continue
        _b, err, bcr, _ = _forward_pass(rr[i], fr[i], terminate=terms[i])
        assert hit2[i] == err
        assert erd2[i] == int(np.flatnonzero(bcr == terms[i])[0])


def test_pallas_batched_ssw_forward_v2(cpu_jax):
    """The one-pair-per-lane v2 SSW kernel must match the host spec in both
    full-scan and reverse-terminate modes (same contract as v1)."""
    import numpy as np
    from ribbit_tpu.align import translate, _forward_pass
    from ribbit_tpu.align_pallas_v2 import batch_forward

    rng = np.random.default_rng(7)
    bases = "ACGTN"
    reads, refs = [], []
    for t in range(24):
        n1 = int(rng.integers(3, 160))
        n2 = int(rng.integers(3, 180))
        if t % 2 == 0:
            motif = "".join(bases[i] for i in rng.integers(0, 4,
                                                           int(rng.integers(2, 12))))
            q = list((motif * 40)[:n1])
            for k in rng.integers(0, max(1, len(q)), max(1, n1 // 8)):
                q[int(k)] = bases[int(rng.integers(0, 5))]
            reads.append(translate("".join(q)))
            refs.append(translate((motif * 60)[:n2]))
        else:
            reads.append(translate("".join(bases[i] for i in rng.integers(0, 5, n1))))
            refs.append(translate("".join(bases[i] for i in rng.integers(0, 5, n2))))

    score, end_ref, end_read, _ = batch_forward(reads, refs, interpret=True)
    for i in range(len(reads)):
        b, er, bc, _mc = _forward_pass(reads[i], refs[i])
        assert score[i] == b and end_ref[i] == er
        if er >= 0:
            assert end_read[i] == int(np.flatnonzero(bc == b)[0])

    terms = [int(score[i]) if end_ref[i] >= 0 else None for i in range(len(reads))]
    rr = [reads[i][:int(end_read[i]) + 1][::-1].copy() if end_ref[i] >= 0
          else reads[i] for i in range(len(reads))]
    fr = [refs[i][:int(end_ref[i]) + 1][::-1].copy() if end_ref[i] >= 0
          else refs[i] for i in range(len(reads))]
    _s2, _er2, erd2, hit2 = batch_forward(rr, fr, terms, interpret=True)
    for i in range(len(reads)):
        if end_ref[i] < 0:
            continue
        _b, err, bcr, _ = _forward_pass(rr[i], fr[i], terminate=terms[i])
        assert hit2[i] == err
        assert erd2[i] == int(np.flatnonzero(bcr == terms[i])[0])
