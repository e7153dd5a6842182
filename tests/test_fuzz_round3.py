"""Round-3 differential fuzz: random synth workloads driven through the
new native paths (windowed fold, lanes packer, mesh packer) must agree
bitwise with the reference fold / full-length pipeline."""

import io

import numpy as np
import pytest

import tests.synth as synth
from polypolish_tpu import log
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.native import loader
from polypolish_tpu.native import runs as native_runs
from polypolish_tpu.pipeline.polish import polish
from polypolish_tpu.vocab import Vocab

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library unavailable"
)


@pytest.mark.parametrize("seed", range(100, 108))
def test_windowed_fuzz(tmp_path, monkeypatch, seed):
    rng = np.random.default_rng(seed)
    genome_len = int(rng.integers(900, 4000))
    fasta, sam_text = synth.make_polish_case(
        seed=seed, genome_len=genome_len,
        n_reads=int(rng.integers(300, 2500)),
        read_len=int(rng.integers(30, 80)),
        err=float(rng.uniform(0.02, 0.14)),
        multi_frac=float(rng.uniform(0.0, 0.6)),
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)

    def run():
        out = io.StringIO()
        with log.quiet():
            polish(None, 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
                   out=out, backend="host")
        return out.getvalue()

    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", "0")
    full = run()
    window = int(rng.integers(64, genome_len + 500))
    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", "1")
    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW", str(window))
    assert run() == full, f"window={window}"


@pytest.mark.parametrize("seed", range(200, 206))
def test_lanes_packers_fuzz(tmp_path, seed):
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote_lanes import _lanes_jit

    rng = np.random.default_rng(seed)
    fasta, sam_text = synth.make_polish_case(
        seed=seed, genome_len=int(rng.integers(700, 3000)),
        n_reads=int(rng.integers(300, 2000)),
        read_len=int(rng.integers(30, 70)),
        err=float(rng.uniform(0.03, 0.12)),
        multi_frac=float(rng.uniform(0.1, 0.5)),
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    fa = load_fasta(asm)
    names = [n for n, _, _ in fa]
    lens = {n: len(s) for n, _, s in fa}
    pr = native_runs.parse_runs([str(sam)], names, lens, Vocab(), 10, False)
    name = names[0]
    P = lens[name]
    counts_ref = pr.fold(name)[0]
    r_sub = int(rng.choice([8, 16, 32]))
    tile_w = int(rng.choice([128, 256, 512]))
    body = str(rng.choice(["packed", "cmp"]))
    pack = pr.lanes(name, r_sub, tile_w)
    got = np.asarray(_lanes_jit(
        jnp.asarray(pack.vb.view(np.int8)), jnp.asarray(pack.block_tile),
        n_tiles=pack.n_tiles, interpret=True, r_sub=r_sub, tile_w=tile_w,
        body=body,
    ))[:, :P]
    np.testing.assert_array_equal(got, counts_ref)
    pack.close()
    # mesh packer on a random mesh shape
    n_data = int(rng.choice([1, 2, 3, 4]))
    n_pos = int(rng.choice([1, 2, 4]))
    vb, bt, p_shard, n_tiles = pr.lanes_mesh(name, n_data, n_pos, r_sub,
                                             tile_w)
    # sum shard counts into global positions (= the psum the SPMD step
    # performs on device)
    total = np.zeros((8, P), np.int64)
    for d in range(n_data):
        for s in range(n_pos):
            part = np.asarray(_lanes_jit(
                jnp.asarray(vb[d, s].view(np.int8)), jnp.asarray(bt[d, s]),
                n_tiles=n_tiles, interpret=True, r_sub=r_sub,
                tile_w=tile_w, body=body,
            ))
            lo = s * p_shard
            w = min(p_shard, max(0, P - lo))
            if w > 0:
                total[:, lo:lo + w] += part[:, :w]
    np.testing.assert_array_equal(total.astype(np.int32), counts_ref)
    pr.close()


@pytest.mark.parametrize("seed", range(300, 306))
def test_cap_and_windowed_device_fuzz(tmp_path, monkeypatch, seed):
    """Round-4 fuzz: the depth-stratified cap pack (kernel + overflow
    scatter) and the windowed DEVICE backend must agree bitwise with
    the host fold / host backend on random workloads."""
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote_lanes import _lanes_jit, add_overflow_counts

    rng = np.random.default_rng(seed)
    genome_len = int(rng.integers(900, 3500))
    fasta, sam_text = synth.make_polish_case(
        seed=seed, genome_len=genome_len,
        n_reads=int(rng.integers(400, 2500)),
        read_len=int(rng.integers(30, 80)),
        err=float(rng.uniform(0.02, 0.14)),
        multi_frac=float(rng.uniform(0.0, 0.6)),
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)

    # capped pack counts == fold
    fa = load_fasta(asm)
    names = [n for n, _, _ in fa]
    lens = {n: len(s) for n, _, s in fa}
    pr = native_runs.parse_runs([str(sam)], names, lens, Vocab(), 10, False)
    name = names[0]
    P = lens[name]
    counts_ref = pr.fold(name)[0]
    r_sub = int(rng.choice([8, 16, 32]))
    tile_w = int(rng.choice([128, 256]))
    pack = pr.lanes(name, r_sub, tile_w, cap=True)
    out = _lanes_jit(
        jnp.asarray(pack.vb.view(np.int8)), jnp.asarray(pack.block_tile),
        n_tiles=pack.n_tiles, interpret=True, r_sub=r_sub, tile_w=tile_w,
    )
    out = add_overflow_counts(out, pack.ov_pos, pack.ov_vid)
    np.testing.assert_array_equal(np.asarray(out)[:, :P], counts_ref)
    pack.close()
    pr.close()

    # windowed device backend == host backend
    def run(backend):
        out_io = io.StringIO()
        with log.quiet():
            polish(None, 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
                   out=out_io, backend=backend)
        return out_io.getvalue()

    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", "0")
    host = run("host")
    window = int(rng.integers(200, genome_len + 500))
    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", "1")
    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW", str(window))
    assert run("pallas") == host, f"window={window}"
