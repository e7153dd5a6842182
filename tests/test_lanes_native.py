"""Native lane-aligned packer (pp_lanes_from_runs) vs the numpy packer
and the host fold: the lanes kernel fed by the native pack must produce
counts bitwise identical to the C++ fold and to numpy-packed lanes.

(The packed BUFFERS may differ between packers — events of one position
can land in different rows depending on scan order — but integer counts
are order-invariant, which is the layout's correctness contract.)
"""

import numpy as np
import pytest

import tests.synth as synth
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.native import loader
from polypolish_tpu.native import runs as native_runs
from polypolish_tpu.ops.vote_lanes import _lanes_jit, prepare_lanes
from polypolish_tpu.vocab import Vocab

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library unavailable"
)


def _parsed(tmp_path, seed=5, genome_len=3000, n_reads=1500):
    fasta, sam_text = synth.make_polish_case(
        seed=seed, genome_len=genome_len, n_reads=n_reads, read_len=60,
        err=0.08, multi_frac=0.4,
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    fa = load_fasta(asm)
    names = [n for n, _, _ in fa]
    lens = {n: len(s) for n, _, s in fa}
    pr = native_runs.parse_runs([str(sam)], names, lens, Vocab(), 10, False)
    return pr, names, lens


def _kernel_counts(vb, block_tile, n_tiles, r_sub, tile_w, P):
    import jax.numpy as jnp

    out = _lanes_jit(
        jnp.asarray(vb.view(np.int8)), jnp.asarray(block_tile),
        n_tiles=n_tiles, interpret=True, r_sub=r_sub, tile_w=tile_w,
    )
    return np.asarray(out)[:, :P]


@pytest.mark.parametrize("r_sub,tile_w", [(8, 128), (32, 256), (32, 1024)])
def test_native_lanes_counts_match_fold(tmp_path, r_sub, tile_w):
    pr, names, lens = _parsed(tmp_path)
    for name in names:
        P = lens[name]
        counts_ref, _, _ = pr.fold(name)[:3]
        pack = pr.lanes(name, r_sub, tile_w)
        assert pack is not None
        assert pack.vb.shape == (pack.n_blocks * r_sub, tile_w)
        got = _kernel_counts(
            pack.vb, pack.block_tile, pack.n_tiles, r_sub, tile_w, P
        )
        np.testing.assert_array_equal(got, counts_ref)
        pack.close()
    pr.close()


def test_native_lanes_matches_numpy_pack(tmp_path):
    r_sub, tile_w = 8, 256
    pr, names, lens = _parsed(tmp_path, seed=9)
    name = names[0]
    P = lens[name]
    pos, vid, _w = pr.events(name)
    vb_np, bt_np, n_tiles_np = prepare_lanes(
        pos, vid, P, r_sub=r_sub, tile_w=tile_w
    )
    pack = pr.lanes(name, r_sub, tile_w)
    assert pack.n_tiles == n_tiles_np
    # same geometric padding -> same block stream shape
    assert pack.n_blocks == bt_np.shape[0]
    np.testing.assert_array_equal(pack.block_tile, bt_np)
    got = _kernel_counts(pack.vb, pack.block_tile, pack.n_tiles,
                         r_sub, tile_w, P)
    want = _kernel_counts(vb_np, bt_np, n_tiles_np, r_sub, tile_w, P)
    np.testing.assert_array_equal(got, want)
    # slot occupancy identical even if row placement differs
    assert int((pack.vb != 255).sum()) == int((vb_np != 255).sum())
    pack.close()
    pr.close()


def test_native_lanes_thread_invariant(tmp_path):
    r_sub, tile_w = 8, 128
    pr, names, lens = _parsed(tmp_path, seed=12, genome_len=5000,
                              n_reads=4000)
    name = names[0]
    P = lens[name]
    ref = None
    for n_threads in (1, 2, 3, 5):
        pack = pr.lanes(name, r_sub, tile_w, n_threads=n_threads)
        got = _kernel_counts(pack.vb, pack.block_tile, pack.n_tiles,
                             r_sub, tile_w, P)
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got, ref)
        pack.close()
    counts_ref = pr.fold(name)[0]
    np.testing.assert_array_equal(ref, counts_ref)
    pr.close()


def test_native_lanes_position_padding(tmp_path):
    # num_positions beyond the contig length (device position bucket)
    pr, names, lens = _parsed(tmp_path, seed=3, genome_len=700, n_reads=400)
    name = names[0]
    P = lens[name]
    P_pad = 4096
    pack = pr.lanes(name, 8, 256, num_positions=P_pad)
    got = _kernel_counts(pack.vb, pack.block_tile, pack.n_tiles, 8, 256,
                         P_pad)
    counts_ref = pr.fold(name)[0]
    np.testing.assert_array_equal(got[:, :P], counts_ref)
    assert int(got[:, P:].sum()) == 0
    pack.close()
    pr.close()


@pytest.mark.parametrize("r_sub,tile_w", [(8, 128), (32, 256)])
def test_native_packed4_layout_counts(tmp_path, r_sub, tile_w):
    """Native packed4 packs (4 byte-rows per int32 lane) must drive the
    packed4 kernel body to counts identical to the fold."""
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote_lanes import _lanes_jit

    pr, names, lens = _parsed(tmp_path, seed=61)
    for name in names:
        P = lens[name]
        counts_ref = pr.fold(name)[0]
        pack = pr.lanes(name, r_sub, tile_w, packed4=True)
        assert pack.vb.dtype == np.int32
        assert pack.vb.shape == (pack.n_blocks * (r_sub // 4), tile_w)
        got = np.asarray(_lanes_jit(
            jnp.asarray(pack.vb), jnp.asarray(pack.block_tile),
            n_tiles=pack.n_tiles, interpret=True, r_sub=r_sub,
            tile_w=tile_w, body="packed4",
        ))[:, :P]
        np.testing.assert_array_equal(got, counts_ref)
        pack.close()
    pr.close()


def test_lanes_polisher_packed4_native(tmp_path):
    """LanesPolisher(body=packed4) end-to-end with a native packed4
    pack: counts bitwise equal to the fold."""
    from polypolish_tpu.models.polisher import LanesPolisher

    pr, names, lens = _parsed(tmp_path, seed=67)
    name = names[0]
    P = lens[name]
    counts_ref = pr.fold(name)[0]
    m = LanesPolisher(P, r_sub=8, tile_w=256, body="packed4")
    pack = pr.lanes(name, 8, 256, packed4=True)
    got = np.asarray(m.vote_counts(pack.vb, pack.block_tile))[:, :P]
    np.testing.assert_array_equal(got, counts_ref)
    pack.close()
    pr.close()
