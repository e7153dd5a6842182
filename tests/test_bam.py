"""BAM input support (extension; the reference reads plain SAM only):
polish and filter must accept .bam (BGZF or uncompressed) and gzipped
SAM on both the native and pure-Python paths, byte-identical to the
same data as plain SAM."""

import gzip
import io

import pytest

import tests.bam_util as bam_util
import tests.synth as synth
from polypolish_tpu import log
from polypolish_tpu.io.bam import bam_to_sam_lines, is_bam
from polypolish_tpu.native import loader
from polypolish_tpu.pipeline.polish import polish


def _case(tmp_path, seed=21):
    fasta, sam_text = synth.make_polish_case(
        seed=seed, genome_len=2500, n_reads=1500, read_len=60, err=0.08,
        multi_frac=0.4,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    return asm, sam, sam_text


def _polish(asm, sams, tmp_path, tag, use_native=True):
    dbg = tmp_path / f"dbg_{tag}.tsv"
    out = io.StringIO()
    with log.quiet():
        polish(str(dbg), 0.2, 0.5, 10, 5, False, str(asm),
               [str(s) for s in sams], out=out, use_native=use_native)
    return out.getvalue(), dbg.read_text()


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("use_native", [True, False])
def test_polish_bam_matches_sam(tmp_path, compress, use_native):
    if use_native and not loader.available():
        pytest.skip("native library unavailable")
    asm, sam, sam_text = _case(tmp_path)
    bam = tmp_path / "a.bam"
    bam_util.write_bam(bam, sam_text, compress=compress)
    assert is_bam(bam)
    want = _polish(asm, [sam], tmp_path, f"s{compress}{use_native}",
                   use_native)
    got = _polish(asm, [bam], tmp_path, f"b{compress}{use_native}",
                  use_native)
    assert got == want


def test_polish_gzip_sam_native_path(tmp_path):
    """Gzipped SAM now runs through the NATIVE engine (round 4) — was
    the Python fallback before."""
    if not loader.available():
        pytest.skip("native library unavailable")
    asm, sam, sam_text = _case(tmp_path, seed=5)
    gz = tmp_path / "a.sam.gz"
    gz.write_bytes(gzip.compress(sam_text.encode()))
    want = _polish(asm, [sam], tmp_path, "plain")
    got = _polish(asm, [gz], tmp_path, "gz")
    assert got == want


def test_polish_mixed_sam_and_bam(tmp_path):
    if not loader.available():
        pytest.skip("native library unavailable")
    asm, sam, sam_text = _case(tmp_path, seed=9)
    bam = tmp_path / "a.bam"
    bam_util.write_bam(bam, sam_text)
    want = _polish(asm, [sam, sam], tmp_path, "ss")
    got = _polish(asm, [sam, bam], tmp_path, "sb")
    assert got == want


def test_python_converter_roundtrip(tmp_path):
    """bam_to_sam_lines must reproduce the original canonical SAM
    text (the synth generator emits canonical fields/tags)."""
    _asm, _sam, sam_text = _case(tmp_path, seed=13)
    bam = tmp_path / "a.bam"
    bam_util.write_bam(bam, sam_text)
    got = "\n".join(bam_to_sam_lines(bam)) + "\n"
    assert got == sam_text


def test_filter_bam_inputs(tmp_path):
    """filter accepts BAM for --in1/--in2 and writes the same SAM
    verdict streams as the equivalent SAM inputs."""
    from polypolish_tpu.pipeline.filtering import filter_pairs

    sam1, sam2 = synth.make_filter_case(seed=3)
    p1 = tmp_path / "in1.sam"
    p2 = tmp_path / "in2.sam"
    p1.write_text(sam1)
    p2.write_text(sam2)
    b1 = tmp_path / "in1.bam"
    b2 = tmp_path / "in2.bam"
    bam_util.write_bam(b1, sam1)
    bam_util.write_bam(b2, sam2)

    def run(i1, i2, tag):
        o1 = tmp_path / f"o1_{tag}.sam"
        o2 = tmp_path / f"o2_{tag}.sam"
        with log.quiet():
            filter_pairs(str(i1), str(i2), str(o1), str(o2))
        return o1.read_text(), o2.read_text()

    assert run(b1, b2, "bam") == run(p1, p2, "sam")


def test_pod_shards_bam(tmp_path):
    """In-process pod-sharded ingest (--pod-shards) over a BAM input:
    byte ranges are computed on the materialised SAM text identically
    in every shard, so output matches the plain path."""
    if not loader.available():
        pytest.skip("native library unavailable")
    from polypolish_tpu.pipeline.pod import polish_pod

    asm, sam, sam_text = _case(tmp_path, seed=17)
    bam = tmp_path / "a.bam"
    bam_util.write_bam(bam, sam_text)
    want = _polish(asm, [sam], tmp_path, "pod_ref")[0]

    out = io.StringIO()
    with log.quiet():
        polish_pod(None, 0.2, 0.5, 10, 5, False, str(asm), [str(bam)],
                   2, out=out)
    assert out.getvalue() == want


def test_corrupt_bam_is_fatal_not_crash(tmp_path):
    """Truncated/corrupt BAM and garbage gzip inputs must fail with the
    reference-style fatal, not crash, on both packers."""
    from polypolish_tpu.errors import PolypolishError

    asm, sam, sam_text = _case(tmp_path, seed=23)
    bad1 = tmp_path / "trunc.bam"
    bam_util.write_bam(bad1, sam_text, compress=False)
    raw = bad1.read_bytes()
    bad1.write_bytes(raw[: len(raw) // 2 + 7])  # mid-record truncation
    bad2 = tmp_path / "garbage.sam.gz"
    bad2.write_bytes(b"\x1f\x8b" + b"\x00" * 64)

    for bad in (bad1, bad2):
        for use_native in (True, False):
            if use_native and not loader.available():
                continue
            out = io.StringIO()
            with pytest.raises((PolypolishError, ValueError, OSError,
                                EOFError)):
                with log.quiet():
                    polish(None, 0.2, 0.5, 10, 5, False, str(asm),
                           [str(bad)], out=out, use_native=use_native)


def test_bam_unaligned_and_star_fields(tmp_path):
    """Hand-rolled corner cases through the BAM codec: unaligned
    records (flag 4, refID -1), '*' CIGAR/seq/qual, secondary '*'-seq
    records, and mixed tag types — polish output must match the SAM
    equivalent on both packers."""
    seq = "ACGTACGTACGTACGTACGT"
    sam_text = "\n".join([
        "@SQ\tSN:c\tLN:40",
        f"r1\t0\tc\t1\t60\t20M\t*\t0\t0\t{seq}\t*\tNM:i:0",
        f"r1\t256\tc\t21\t0\t20M\t*\t0\t0\t*\t*\tNM:i:1",
        "r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",
        f"r3\t16\tc\t11\t60\t20M\t*\t0\t0\t{seq}\t*\tNM:i:2\tAS:i:37\t"
        "XX:Z:note",
    ]) + "\n"
    asm = tmp_path / "a.fasta"
    asm.write_text(">c x\n" + "ACGTACGTACGTACGTACGT" * 2 + "\n")
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    bam = tmp_path / "a.bam"
    bam_util.write_bam(bam, sam_text)
    # converter text fidelity on the corner-case fields
    assert "\n".join(bam_to_sam_lines(bam)) + "\n" == sam_text
    for use_native in (True, False):
        if use_native and not loader.available():
            continue
        want = _polish(asm, [sam], tmp_path, f"cs{use_native}",
                       use_native)
        got = _polish(asm, [bam], tmp_path, f"cb{use_native}",
                      use_native)
        assert got == want


def test_batch_manifest_with_bam(tmp_path):
    """batch manifests may list BAM alignment inputs."""
    if not loader.available():
        pytest.skip("native library unavailable")
    from polypolish_tpu.pipeline.batch import polish_batch

    asm, sam, sam_text = _case(tmp_path, seed=29)
    bam = tmp_path / "a.bam"
    bam_util.write_bam(bam, sam_text)
    out_s = tmp_path / "out_s.fasta"
    out_b = tmp_path / "out_b.fasta"
    with log.quiet():
        results = polish_batch([
            (str(asm), str(out_s), [str(sam)]),
            (str(asm), str(out_b), [str(bam)]),
        ], workers=2)
    assert all("error" not in r for r in results)
    assert out_s.read_text() == out_b.read_text()

# ---------------------------------------------------------------------
# Round-5 hardening (ADVICE round 4): truncated-gzip acceptance, tag
# payload bounds, reserved CIGAR op codes.
# ---------------------------------------------------------------------

import struct
import zlib


def test_truncated_gzip_member_is_fatal(tmp_path):
    """A .sam.gz / BGZF BAM cut mid-member must be a hard error on BOTH
    packers, never a silently-parsed prefix (truncation at a line/record
    boundary would otherwise decode 'cleanly' and drop alignments)."""
    from polypolish_tpu.errors import PolypolishError
    from polypolish_tpu.io.bam import _inflate_all

    asm, sam, sam_text = _case(tmp_path, seed=31)

    # single-member gzip SAM, truncated mid-member (a decoded prefix
    # could end on a line boundary and would otherwise parse clean)
    gz_body = gzip.compress(sam_text.encode())
    trunc = tmp_path / "t.sam.gz"
    trunc.write_bytes(gz_body[: int(len(gz_body) * 0.6)])

    if loader.available():
        out = io.StringIO()
        with pytest.raises(PolypolishError, match="truncated gzip"):
            with log.quiet():
                polish(None, 0.2, 0.5, 10, 5, False, str(asm),
                       [str(trunc)], out=out, use_native=True)

    # BGZF BAM truncated mid-member: the pure-Python inflate must raise
    bam = tmp_path / "t.bam"
    bam_util.write_bam(bam, sam_text, compress=True)
    raw = bam.read_bytes()
    cut = tmp_path / "cut.bam"
    cut.write_bytes(raw[: len(raw) - 40])  # drop EOF marker + tail
    with pytest.raises(ValueError, match="truncated gzip"):
        _inflate_all(cut)


def _manual_bam(tmp_path, tag_bytes=b"", cigar_ops=((4, 0),)):
    """Uncompressed single-record BAM with raw control over the tag
    bytes and CIGAR op codes (block length always self-consistent, so
    record-level guards pass and the tag/CIGAR decoders are reached)."""
    out = bytearray(b"BAM\x01")
    text = b"@SQ\tSN:ref\tLN:10\n"
    out += struct.pack("<I", len(text)) + text
    out += struct.pack("<i", 1)
    out += struct.pack("<I", 4) + b"ref\x00" + struct.pack("<i", 10)
    name_b = b"r1\x00"
    seq = "ACGT"
    sq = bytes((bam_util.SEQ_CODE[seq[i]] << 4)
               | (bam_util.SEQ_CODE[seq[i + 1]] if i + 1 < 4 else 0)
               for i in range(0, 4, 2))
    body = struct.pack("<iiBBHHHIiii", 0, 0, len(name_b), 60, 0,
                       len(cigar_ops), 0, 4, -1, -1, 0)
    body += name_b
    body += b"".join(struct.pack("<I", (ln << 4) | op)
                     for ln, op in cigar_ops)
    body += sq + b"\x1e" * 4 + bytes(tag_bytes)
    out += struct.pack("<I", len(body)) + body
    p = tmp_path / "manual.bam"
    p.write_bytes(bytes(out))
    return p


@pytest.mark.parametrize("tag_bytes,msg", [
    (b"XXZabc", "unterminated BAM string tag"),      # Z without NUL
    (b"XXi\x01", "truncated BAM tag"),               # int cut short
    (b"XXf\x00\x00", "truncated BAM tag"),           # float cut short
    (b"XXA", "truncated BAM tag"),                   # A with no value
    (b"XXBc\x10\x00\x00\x00\x01", "truncated BAM tag"),  # B count 16, 1 B
    (b"XXBq\x01\x00\x00\x00\x00", "bad BAM B subtype"),  # bad subtype
    (b"XX", "truncated BAM tag"),                    # header cut short
])
def test_malformed_bam_tags_fail_cleanly(tmp_path, tag_bytes, msg):
    """Malformed tag payloads raise the same clean errors as the native
    converter, not raw IndexError/struct.error (ADVICE r4)."""
    bad = _manual_bam(tmp_path, tag_bytes=tag_bytes)
    with pytest.raises(ValueError, match=msg):
        list(bam_to_sam_lines(bad))


def test_malformed_bam_tags_native_fatal(tmp_path):
    """The native converter reports the matching clean fatal for a
    malformed tag payload (no crash, no silent acceptance)."""
    if not loader.available():
        pytest.skip("native library unavailable")
    from polypolish_tpu.errors import PolypolishError

    asm = tmp_path / "a.fasta"
    asm.write_text(">ref x\nACGTACGTAC\n")
    bad = _manual_bam(tmp_path, tag_bytes=b"XXZabc")
    out = io.StringIO()
    with pytest.raises(PolypolishError, match="unterminated BAM string"):
        with log.quiet():
            polish(None, 0.2, 0.5, 10, 5, False, str(asm), [str(bad)],
                   out=out, use_native=True)


def test_reserved_bam_cigar_op_renders_question_mark(tmp_path):
    """Reserved BAM CIGAR op codes 9-15 render as '?' (native parity)
    and then fail cleanly in the SAM CIGAR validator, instead of
    raising IndexError inside the converter."""
    bad = _manual_bam(tmp_path, tag_bytes=b"NMi\x00\x00\x00\x00",
                      cigar_ops=((4, 11),))
    lines = list(bam_to_sam_lines(bad))
    rec = [ln for ln in lines if not ln.startswith("@")][0]
    assert rec.split("\t")[5] == "4?"
