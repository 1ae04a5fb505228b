"""Gorilla-style chunk compression as vectorized NumPy bit-twiddling.

Implements the two streams of the Gorilla TSDB paper (Pelkonen et al.,
VLDB 2015, "Gorilla: A Fast, Scalable, In-Memory Time Series Database"):

* **values** — XOR with the previous value; a zero XOR costs 1 bit; a
  non-zero XOR is emitted as control ``11`` + 5-bit leading-zero count +
  6-bit significant-bit length + the significant bits.  (The paper's
  ``10`` previous-window-reuse branch is a pure size optimization; this
  encoder always re-emits the window so every per-value token is
  computable independently — which is what makes the encoder fully
  vectorizable — while the bit format stays a decodable subset of
  Gorilla's.)
* **timestamps** — header + first delta, then delta-of-delta bucketed
  into ``0`` / ``10``+7b / ``110``+9b / ``1110``+12b / ``1111``+64b
  tokens (the last widened from the paper's 32 bits to hold arbitrary
  int64 gaps, e.g. microsecond timestamps).

Both encoders build (token, bit-length) arrays with NumPy and assemble
the bit stream with a 64-iteration vectorized scatter — no per-value
Python loop.  Decoders walk the bit array with an index pointer (decode
is inherently sequential); they also accept streams produced by
full-Gorilla encoders (the ``10`` reuse branch is handled).

Chunks are self-describing: ``encode_values`` output starts with a
32-bit count.  NaN, +-0.0, infinities and denormals round-trip exactly
(everything is moved as raw IEEE-754 bit patterns).
"""

from __future__ import annotations

import numpy as np

_POW2 = (2 ** np.arange(63, -1, -1, dtype=np.float64))  # bit weights


def _assemble(tokens: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    """Pack (token, nbits) pairs MSB-first into a uint8 bit array.

    ``tokens`` holds the value of each token in its low ``nbits`` bits
    (object/uint64 array); 64 vectorized passes write bit column b of
    every token that has one.
    """
    nbits = nbits.astype(np.int64)
    keep = nbits > 0
    tokens, nbits = tokens[keep], nbits[keep]
    m = len(nbits)
    if m == 0:
        return np.zeros(0, dtype=np.uint8)
    total = int(nbits.sum())
    offsets = np.cumsum(nbits) - nbits
    # one unpackbits over the big-endian byte view gives every token's
    # 64 MSB-first bits as row i of a (m, 64) matrix; each token then
    # contributes its LOW nbits[i] bits (matrix columns 64-nbits..63) to
    # output positions offsets[i]..offsets[i]+nbits[i] — a single flat
    # gather, O(total_bits), no per-bit-position passes
    bitmat = np.unpackbits(
        tokens.astype(">u8").view(np.uint8)
    )
    intra = np.arange(total, dtype=np.int64) - np.repeat(offsets, nbits)
    src = np.repeat(
        np.arange(m, dtype=np.int64) * 64 + (64 - nbits), nbits
    ) + intra
    return bitmat[src]


def _read_bits(bits: np.ndarray, pos: int, n: int) -> int:
    """Read n bits MSB-first from position pos as a Python int."""
    out = 0
    for b in bits[pos : pos + n]:
        out = (out << 1) | int(b)
    return out


# ------------------------------------------------------------------ values
def encode_values(values: np.ndarray) -> bytes:
    """Gorilla-XOR encode a float64 array into a self-describing chunk."""
    vals = np.ascontiguousarray(values, dtype=np.float64)
    n = len(vals)
    header = np.uint32(n).tobytes()
    if n == 0:
        return header
    raw = vals.view(np.uint64)
    first = raw[0]

    if n == 1:
        xors = np.empty(0, dtype=np.uint64)
    else:
        xors = raw[1:] ^ raw[:-1]

    zero = xors == 0
    # leading / trailing zero counts of each xor (vectorized halving steps)
    lead = np.minimum(_clz64(xors), 31)  # clamp to the 5-bit field
    trail = _ctz64(xors)
    sig = np.where(zero, 0, 64 - lead - trail).astype(np.int64)

    # per value: control token, meta token, payload token
    m = n - 1
    tokens = np.zeros((m, 3), dtype=np.uint64)
    nbits = np.zeros((m, 3), dtype=np.int64)
    # control: '0' for zero xor; '11' for new-window emit
    tokens[:, 0] = np.where(zero, 0, 0b11)
    nbits[:, 0] = np.where(zero, 1, 2)
    # meta: 5b leading + 6b significant-length (64 significant bits is
    # stored as 0 — the Gorilla convention; decoder maps 0 back to 64)
    tokens[:, 1] = (lead.astype(np.uint64) << np.uint64(6)) | (
        sig.astype(np.uint64) & np.uint64(63)
    )
    nbits[:, 1] = np.where(zero, 0, 11)
    # payload: significant bits
    shift = np.where(zero, 0, trail).astype(np.uint64)
    tokens[:, 2] = xors >> shift
    nbits[:, 2] = np.where(zero, 0, sig)

    bits = _assemble(tokens.ravel(), nbits.ravel())
    first_bits = np.unpackbits(
        np.frombuffer(np.uint64(first).tobytes()[::-1], dtype=np.uint8)
    )
    stream = np.concatenate([first_bits, bits])
    return header + np.packbits(stream).tobytes()


def decode_values(chunk: bytes) -> np.ndarray:
    """Decode a value chunk (handles the full Gorilla control set).

    Sequential by nature (token boundaries depend on prior tokens), so
    the loop stays in Python — but every field is read with one
    ``int.from_bytes`` over a <=10-byte window rather than per-bit
    array indexing, which is ~10x faster per token.
    """
    n = int.from_bytes(chunk[:4], "little")
    if n == 0:
        return np.empty(0, dtype=np.float64)
    body = chunk[4:]

    def read(pos: int, nb: int) -> int:
        a = pos >> 3
        b = (pos + nb + 7) >> 3
        w = int.from_bytes(body[a:b], "big")
        return (w >> (((b - a) << 3) - (pos & 7) - nb)) & ((1 << nb) - 1)

    prev = read(0, 64)
    out = [prev]
    pos = 64
    lead = sig = 0
    for _ in range(1, n):
        if not (body[pos >> 3] >> (7 - (pos & 7))) & 1:  # identical
            pos += 1
            out.append(prev)
            continue
        p1 = pos + 1
        if (body[p1 >> 3] >> (7 - (p1 & 7))) & 1:  # new window
            meta = read(pos + 2, 11)
            lead = meta >> 6
            sig = (meta & 63) or 64
            pos += 13
        else:  # reuse previous window (streams from full encoders)
            pos += 2
        payload = read(pos, sig)
        pos += sig
        prev ^= payload << (64 - lead - sig)
        out.append(prev)
    return np.array(out, dtype=np.uint64).view(np.float64)


# -------------------------------------------------------------- timestamps
#: (two's-complement bound, control, control bits, field bits) — field f
#: holds dod in [-2^(f-1), 2^(f-1) - 1]
_TS_BUCKETS = [
    (64, 0b10, 2, 7),
    (256, 0b110, 3, 9),
    (2048, 0b1110, 4, 12),
]


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 timestamp array."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    header = np.uint32(n).tobytes()
    if n == 0:
        return header
    parts = [t[0].astype(np.uint64)]
    lens = [64]
    if n >= 2:
        parts.append((t[1] - t[0]).astype(np.uint64))
        lens.append(64)
    head = header + np.packbits(
        _assemble(np.array(parts, dtype=np.uint64), np.array(lens))
    ).tobytes()
    if n < 3:
        return head

    delta = t[1:] - t[:-1]
    dod = delta[1:] - delta[:-1]
    m = len(dod)
    tokens = np.zeros((m, 2), dtype=np.uint64)
    nbits = np.zeros((m, 2), dtype=np.int64)
    done = dod == 0
    nbits[:, 0] = np.where(done, 1, 0)  # control '0'
    for bound, ctrl, ctrl_bits, field in _TS_BUCKETS:
        fits = (~done) & (dod >= -bound) & (dod <= bound - 1)
        tokens[fits, 0] = ctrl
        nbits[fits, 0] = ctrl_bits
        tokens[fits, 1] = (dod[fits] & ((1 << field) - 1)).astype(np.uint64)
        nbits[fits, 1] = field
        done = done | fits
    rest = ~done
    tokens[rest, 0] = 0b1111
    nbits[rest, 0] = 4
    tokens[rest, 1] = dod[rest].astype(np.int64).view(np.uint64)
    nbits[rest, 1] = 64

    body = np.packbits(_assemble(tokens.ravel(), nbits.ravel())).tobytes()
    return head + body


def decode_timestamps(chunk: bytes) -> np.ndarray:
    n = int.from_bytes(chunk[:4], "little")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    body = chunk[4:]

    def read(pos: int, nb: int) -> int:
        a = pos >> 3
        b = (pos + nb + 7) >> 3
        w = int.from_bytes(body[a:b], "big")
        return (w >> (((b - a) << 3) - (pos & 7) - nb)) & ((1 << nb) - 1)

    def bit(pos: int) -> int:
        return (body[pos >> 3] >> (7 - (pos & 7))) & 1

    s63, s64 = 1 << 63, 1 << 64

    def se64(raw: int) -> int:  # sign-extend 64-bit
        return (raw ^ s63) - s63

    def wrap(x: int) -> int:  # int64 wraparound semantics
        return ((x + s63) % s64) - s63

    out = [se64(read(0, 64))]
    if n == 1:
        return np.array(out, dtype=np.int64)
    # Python-int delta arithmetic: immune to transient int64 overflow on
    # adversarial gaps (every stored value wraps back to int64)
    delta = se64(read(64, 64))
    out.append(wrap(out[0] + delta))
    pos = 128
    for _ in range(2, n):
        if bit(pos) == 0:
            pos += 1
        else:
            if bit(pos + 1) == 0:
                field, pos = 7, pos + 2
            elif bit(pos + 2) == 0:
                field, pos = 9, pos + 3
            elif bit(pos + 3) == 0:
                field, pos = 12, pos + 4
            else:
                field, pos = 64, pos + 4
            raw = read(pos, field)
            pos += field
            if field == 64:
                dod = se64(raw)
            else:
                # sign-extend the two's-complement field
                sign = 1 << (field - 1)
                dod = (raw ^ sign) - sign
            delta = delta + dod
        out.append(wrap(out[-1] + delta))
    return np.array(out, dtype=np.int64)


# --------------------------------------------------- bit-count primitives
def _bitlen64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length for uint64 (0 for x == 0)."""
    cur = x.astype(np.uint64).copy()
    n = np.zeros(cur.shape, dtype=np.int64)
    for width in (32, 16, 8, 4, 2, 1):
        w = np.uint64(width)
        big = (cur >> w) != 0
        n += width * big
        cur = np.where(big, cur >> w, cur)
    return n + (cur != 0)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (64 for x == 0)."""
    return 64 - _bitlen64(x)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (64 for x == 0)."""
    x = x.astype(np.uint64)
    isolated = x & (~x + np.uint64(1))  # lowest set bit
    f = isolated.astype(np.float64)
    with np.errstate(divide="ignore"):
        tz = np.where(
            x == 0, 64, np.log2(f, where=f > 0, out=np.zeros_like(f))
        )
    return np.rint(tz).astype(np.int64)


# ----------------------------------------------------- grouped encoders
def _value_tokens(
    raw: np.ndarray, prev: np.ndarray, header: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (token, nbits) triples for the XOR value stream.

    ``header`` marks rows that start a chunk (emitted as a raw 64-bit
    value); other rows XOR against ``prev``.  Returns (N, 3) arrays.
    """
    n = len(raw)
    xors = np.where(header, np.uint64(0), raw ^ prev)
    zero = xors == 0
    lead = np.minimum(_clz64(xors), 31)
    trail = _ctz64(xors)
    sig = np.where(zero, 0, 64 - lead - trail).astype(np.int64)

    tokens = np.zeros((n, 3), dtype=np.uint64)
    nbits = np.zeros((n, 3), dtype=np.int64)
    tokens[:, 0] = np.where(zero, 0, 0b11)
    nbits[:, 0] = np.where(zero, 1, 2)
    tokens[:, 1] = (lead.astype(np.uint64) << np.uint64(6)) | (
        sig.astype(np.uint64) & np.uint64(63)
    )
    nbits[:, 1] = np.where(zero, 0, 11)
    shift = np.where(zero, 0, trail).astype(np.uint64)
    tokens[:, 2] = xors >> shift
    nbits[:, 2] = np.where(zero, 0, sig)
    # chunk-header rows: one raw 64-bit token
    tokens[header, 0] = raw[header]
    nbits[header, 0] = 64
    tokens[header, 1:] = 0
    nbits[header, 1:] = 0
    return tokens, nbits


def _split_groups(
    bits: np.ndarray,
    row_bits: np.ndarray,
    lengths: np.ndarray,
    starts: np.ndarray,
) -> list[bytes]:
    """Slice the partition-wide bit stream back into per-group chunks."""
    group_bits = np.add.reduceat(row_bits, starts)
    offsets = np.concatenate([[0], np.cumsum(group_bits)[:-1]])
    out = []
    for g in range(len(lengths)):
        o, gb = int(offsets[g]), int(group_bits[g])
        out.append(
            np.uint32(lengths[g]).tobytes()
            + np.packbits(bits[o : o + gb]).tobytes()
        )
    return out


def encode_values_grouped(
    values: np.ndarray, lengths: np.ndarray
) -> list[bytes]:
    """Encode many concatenated series in one vectorized pass.

    ``values`` is the concatenation of the groups' float64 series (in
    order), ``lengths`` the per-group lengths.  Byte-identical to
    calling :func:`encode_values` per group (tested), but the bit
    assembly runs once over the whole partition instead of per chunk.
    """
    vals = np.ascontiguousarray(values, dtype=np.float64)
    lengths = np.asarray(lengths, dtype=np.int64)
    if len(vals) == 0 or lengths.sum() != len(vals):
        if len(lengths) and lengths.sum() != len(vals):
            raise ValueError("lengths do not sum to len(values)")
        return [np.uint32(0).tobytes() for _ in lengths]
    starts = np.cumsum(lengths) - lengths
    raw = vals.view(np.uint64)
    header = np.zeros(len(raw), dtype=bool)
    header[starts] = True
    prev = np.roll(raw, 1)
    tokens, nbits = _value_tokens(raw, prev, header)
    bits = _assemble(tokens.ravel(), nbits.ravel())
    return _split_groups(bits, nbits.sum(axis=1), lengths, starts)


def encode_timestamps_grouped(
    ts: np.ndarray, lengths: np.ndarray
) -> list[bytes]:
    """Grouped delta-of-delta encoder; byte-identical to per-group
    :func:`encode_timestamps`."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    if len(t) == 0 or lengths.sum() != len(t):
        if len(lengths) and lengths.sum() != len(t):
            raise ValueError("lengths do not sum to len(ts)")
        return [np.uint32(0).tobytes() for _ in lengths]
    starts = np.cumsum(lengths) - lengths
    n = len(t)
    pos_in_group = np.arange(n) - np.repeat(starts, lengths)

    prev = np.roll(t, 1)
    prev2 = np.roll(t, 2)
    delta = t - prev
    dod = delta - (prev - prev2)

    tokens = np.zeros((n, 2), dtype=np.uint64)
    nbits = np.zeros((n, 2), dtype=np.int64)
    # row 0 of each group: raw 64-bit ts; row 1: raw 64-bit first delta
    first = pos_in_group == 0
    second = pos_in_group == 1
    rest = ~(first | second)
    tokens[first, 0] = t[first].view(np.uint64)
    nbits[first, 0] = 64
    tokens[second, 0] = delta[second].view(np.uint64)
    nbits[second, 0] = 64

    done = rest & (dod == 0)
    nbits[done, 0] = 1  # control '0'
    assigned = done | ~rest
    for bound, ctrl, ctrl_bits, field in _TS_BUCKETS:
        fits = (~assigned) & (dod >= -bound) & (dod <= bound - 1)
        tokens[fits, 0] = ctrl
        nbits[fits, 0] = ctrl_bits
        tokens[fits, 1] = (dod[fits] & ((1 << field) - 1)).astype(np.uint64)
        nbits[fits, 1] = field
        assigned = assigned | fits
    over = ~assigned
    tokens[over, 0] = 0b1111
    nbits[over, 0] = 4
    tokens[over, 1] = dod[over].view(np.uint64)
    nbits[over, 1] = 64

    bits = _assemble(tokens.ravel(), nbits.ravel())
    return _split_groups(bits, nbits.sum(axis=1), lengths, starts)
