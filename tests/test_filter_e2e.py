"""End-to-end filter tests vs the independent oracle: ZP:Z:fail tagging
must match line-for-line."""

import pytest

import synth
from oracle import oracle_filter

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.pipeline.filtering import filter_pairs


def _run_filter(tmp_path, sam1, sam2, tag, **kwargs):
    in1 = tmp_path / f"in1_{tag}.sam"
    in2 = tmp_path / f"in2_{tag}.sam"
    out1 = tmp_path / f"out1_{tag}.sam"
    out2 = tmp_path / f"out2_{tag}.sam"
    in1.write_text(sam1)
    in2.write_text(sam2)
    filter_pairs(str(in1), str(in2), str(out1), str(out2), **kwargs)
    return out1.read_text(), out2.read_text()


def _expected_output(sam_text, verdicts):
    out_lines = []
    idx = 0
    for line in sam_text.splitlines():
        if line.startswith("@"):
            out_lines.append(line)
            continue
        flags = int(line.split("\t")[1])
        if flags & 4:
            out_lines.append(line)
            continue
        if verdicts[idx]:
            out_lines.append(line)
        else:
            out_lines.append(line + "\tZP:Z:fail")
        idx += 1
    return "\n".join(out_lines) + "\n"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_filter_matches_oracle(tmp_path, seed):
    sam1, sam2 = synth.make_filter_case(seed=seed)
    v1, v2, _, _, _ = oracle_filter(sam1, sam2)
    got1, got2 = _run_filter(tmp_path, sam1, sam2, f"s{seed}")
    assert got1 == _expected_output(sam1, v1)
    assert got2 == _expected_output(sam2, v2)


def test_filter_explicit_orientation(tmp_path):
    sam1, sam2 = synth.make_filter_case(seed=3)
    v1, v2, _, _, _ = oracle_filter(sam1, sam2, orientation="fr")
    got1, got2 = _run_filter(tmp_path, sam1, sam2, "fr", orientation="fr")
    assert got1 == _expected_output(sam1, v1)
    assert got2 == _expected_output(sam2, v2)


def test_filter_nondefault_percentiles(tmp_path):
    sam1, sam2 = synth.make_filter_case(seed=4)
    v1, v2, _, _, _ = oracle_filter(sam1, sam2, low_pct=5.0, high_pct=95.0)
    got1, got2 = _run_filter(tmp_path, sam1, sam2, "p", low=5.0, high=95.0)
    assert got1 == _expected_output(sam1, v1)
    assert got2 == _expected_output(sam2, v2)


def test_filter_python_loader_matches_native(tmp_path, monkeypatch):
    """The Python fallback loader and the native pair quick-parse must
    produce identical filter output."""
    from polypolish_tpu.native import loader
    from polypolish_tpu.pipeline import filtering

    if not loader.available():
        pytest.skip("native library unavailable")
    sam1, sam2 = synth.make_filter_case(seed=8, n_pairs=150, multi_frac=0.5)
    nat1, nat2 = _run_filter(tmp_path, sam1, sam2, "nat")
    monkeypatch.setattr(filtering, "_load_native", lambda a, b: None)
    py1, py2 = _run_filter(tmp_path, sam1, sam2, "py")
    assert nat1 == py1
    assert nat2 == py2


def test_filter_jax_grid_path(tmp_path, monkeypatch):
    """Force the jitted JAX pair-grid path and check it matches the
    numpy path's output exactly."""
    from polypolish_tpu.pipeline import filtering

    sam1, sam2 = synth.make_filter_case(seed=9, n_pairs=200, multi_frac=0.8)
    v1, v2, _, _, _ = oracle_filter(sam1, sam2)
    monkeypatch.setattr(filtering, "_JAX_GRID_THRESHOLD", 0)
    got1, got2 = _run_filter(tmp_path, sam1, sam2, "jax")
    assert got1 == _expected_output(sam1, v1)
    assert got2 == _expected_output(sam2, v2)


def test_filter_input_validation(tmp_path):
    sam1, sam2 = synth.make_filter_case(seed=5, n_pairs=10)
    in1 = tmp_path / "a.sam"
    in2 = tmp_path / "b.sam"
    in1.write_text(sam1)
    in2.write_text(sam2)
    with pytest.raises(PolypolishError, match="unique values"):
        filter_pairs(str(in1), str(in1), str(tmp_path / "o1"), str(tmp_path / "o2"))
    with pytest.raises(PolypolishError, match="--low"):
        filter_pairs(
            str(in1), str(in2), str(tmp_path / "o1"), str(tmp_path / "o2"), low=60.0
        )
    with pytest.raises(PolypolishError, match="--high"):
        filter_pairs(
            str(in1), str(in2), str(tmp_path / "o1"), str(tmp_path / "o2"), high=40.0
        )


def test_filter_bad_orientation_string_fails(tmp_path, capsys):
    """Pinned behavior for a garbage --orientation string (VERDICT r4
    item 8): exactly the reference's path — the string is echoed in the
    'User-specified correct orientation' narrative (filter.rs:232-234),
    then the run dies with the reference's downstream empty-size-vector
    fatal (filter.rs:174-176), because an unknown orientation selects an
    empty insert-size set just like a valid-but-absent one does."""
    sam1, sam2 = synth.make_filter_case(seed=6, n_pairs=20)
    in1 = tmp_path / "a.sam"
    in2 = tmp_path / "b.sam"
    in1.write_text(sam1)
    in2.write_text(sam2)
    with pytest.raises(
        PolypolishError,
        match="^no read pairs available to determine insert size "
              "thresholds$",
    ):
        filter_pairs(
            str(in1), str(in2), str(tmp_path / "o1"), str(tmp_path / "o2"),
            orientation="xx",
        )
    err = capsys.readouterr().err
    assert "User-specified correct orientation: xx" in err


def test_filter_valid_orientation_with_no_pairs_same_fatal(tmp_path):
    """A VALID --orientation with zero observed pairs of that geometry
    dies with the same message (reference: remove() returns the empty
    Vec either way, filter.rs:174-176)."""
    sam1, sam2 = synth.make_filter_case(seed=6, n_pairs=20)
    in1 = tmp_path / "a.sam"
    in2 = tmp_path / "b.sam"
    in1.write_text(sam1)
    in2.write_text(sam2)
    with pytest.raises(PolypolishError, match="no read pairs available"):
        filter_pairs(
            str(in1), str(in2), str(tmp_path / "o1"), str(tmp_path / "o2"),
            orientation="rr",
        )
