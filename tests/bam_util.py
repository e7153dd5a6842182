"""Test-only BAM writer: encode SAM text into a BGZF-compressed BAM
(SAM spec §4), used to exercise the framework's BAM input support."""

from __future__ import annotations

import struct
import zlib

CIGAR_OPS = "MIDNSHP=X"
SEQ16 = "=ACMGRSVTWYHKDBN"
SEQ_CODE = {c: i for i, c in enumerate(SEQ16)}


def _encode_cigar(cigar: str):
    ops = []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            ops.append((int(num) << 4) | CIGAR_OPS.index(ch))
            num = ""
    return ops


def _encode_tags(fields):
    out = bytearray()
    for f in fields:
        tag, typ, val = f.split(":", 2)
        out += tag.encode()
        if typ == "i":
            out += b"i" + struct.pack("<i", int(val))
        elif typ == "A":
            out += b"A" + val.encode()[:1]
        elif typ == "f":
            out += b"f" + struct.pack("<f", float(val))
        elif typ in ("Z", "H"):
            out += typ.encode() + val.encode("latin-1") + b"\x00"
        elif typ == "B":
            parts = val.split(",")
            sub = parts[0]
            vals = parts[1:]
            out += b"B" + sub.encode() + struct.pack("<I", len(vals))
            fmt = {"c": "b", "C": "B", "s": "<h", "S": "<H",
                   "i": "<i", "I": "<I", "f": "<f"}[sub]
            conv = float if sub == "f" else int
            for v in vals:
                out += struct.pack(fmt, conv(v))
        else:
            raise ValueError(f"tag type {typ} unsupported by test writer")
    return bytes(out)


def sam_to_bam_bytes(sam_text: str) -> bytes:
    """Uncompressed BAM byte stream for a SAM text document."""
    header_lines = []
    refs = []  # (name, length)
    ref_ids = {}
    records = []
    for line in sam_text.splitlines():
        if not line:
            continue
        if line.startswith("@"):
            header_lines.append(line)
            if line.startswith("@SQ"):
                name = length = None
                for f in line.split("\t")[1:]:
                    if f.startswith("SN:"):
                        name = f[3:]
                    elif f.startswith("LN:"):
                        length = int(f[3:])
                if name is not None:
                    ref_ids[name] = len(refs)
                    refs.append((name, length or 0))
            continue
        records.append(line)

    out = bytearray(b"BAM\x01")
    text = ("\n".join(header_lines) + "\n") if header_lines else ""
    tb = text.encode("latin-1")
    out += struct.pack("<I", len(tb)) + tb
    out += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode("latin-1") + b"\x00"
        out += struct.pack("<I", len(nb)) + nb + struct.pack("<i", length)

    for line in records:
        f = line.split("\t")
        qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, seq, \
            qual = f[:11]
        tags = f[11:]
        ref_id = ref_ids.get(rname, -1) if rname != "*" else -1
        next_ref = (ref_id if rnext == "=" else
                    ref_ids.get(rnext, -1) if rnext != "*" else -1)
        cig = [] if cigar == "*" else _encode_cigar(cigar)
        sq = b"" if seq == "*" else bytes(
            (SEQ_CODE.get(seq[i].upper(), 15) << 4)
            | (SEQ_CODE.get(seq[i + 1].upper(), 15)
               if i + 1 < len(seq) else 0)
            for i in range(0, len(seq), 2)
        )
        l_seq = 0 if seq == "*" else len(seq)
        if l_seq and qual == "*":
            qb = b"\xff" * l_seq
        else:
            qb = bytes((ord(c) - 33) for c in qual) if l_seq else b""
        name_b = qname.encode("latin-1") + b"\x00"
        body = struct.pack(
            "<iiBBHHHIiii", ref_id, int(pos) - 1, len(name_b), int(mapq),
            0, len(cig), int(flag), l_seq, next_ref, int(pnext) - 1,
            int(tlen),
        )
        body += name_b
        body += b"".join(struct.pack("<I", c) for c in cig)
        body += sq + qb + _encode_tags(tags)
        out += struct.pack("<I", len(body)) + body
    return bytes(out)


def bgzf_compress(payload: bytes, block: int = 60000) -> bytes:
    """Wrap a byte stream in BGZF blocks (+ the standard EOF block)."""
    out = bytearray()
    for off in range(0, len(payload), block):
        chunk = payload[off:off + block]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 25 + 1  # header(12)+XLEN(6)+data+crc+isize
        out += b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        out += struct.pack("<H", 6)  # XLEN
        out += b"BC" + struct.pack("<HH", 2, bsize - 1)
        out += cdata
        out += struct.pack("<I", zlib.crc32(chunk))
        out += struct.pack("<I", len(chunk) & 0xFFFFFFFF)
    # standard BGZF EOF marker
    out += bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    )
    return bytes(out)


def write_bam(path, sam_text: str, compress: bool = True) -> None:
    payload = sam_to_bam_bytes(sam_text)
    with open(path, "wb") as f:
        f.write(bgzf_compress(payload) if compress else payload)
