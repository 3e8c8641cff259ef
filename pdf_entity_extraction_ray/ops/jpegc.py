"""Baseline-sequential JPEG codec in pure numpy + stdlib (no PIL).

Closes the largest stubbed real-data surface from round 3: web corpora
are overwhelmingly JPEG, and ``ops/multimodal.py`` import-gated the
decode.  This module implements the public ITU-T T.81 baseline process
directly:

* ``decode_jpeg`` — a GENERAL baseline + progressive decoder: canonical
  Huffman tables built from the file's own DHT segments, any component
  count, 4:4:4 / 4:2:2 / 4:2:0 subsampling via sampling factors, 8/16-bit
  DQT, restart markers, JFIF YCbCr -> RGB.  Progressive (SOF2) implements
  the full T.81 Annex G Huffman path: spectral selection, successive
  approximation (DC + AC first/refinement scans), EOB runs, and buffered
  correction bits.  Arithmetic-coded and lossless/hierarchical frames
  raise ``NotImplementedError`` naming the gap.
* ``encode_jpeg`` — a bitstream-legal baseline encoder used to synthesize
  deterministic test payloads: Annex-K quantization tables with libjpeg
  quality scaling, forward DCT, and fixed-length canonical Huffman tables
  written into DHT (legal prefix codes every conformant decoder —
  including this one — reads from the file; compactness is not the
  point, correctness is).  Supports 4:4:4 and 4:2:0.

Everything is float64/int math — deterministic across workers, so
decoded features are hash-exact against a single-process gold.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1/K.2 base quantization tables (zigzag-NATURAL raster order here)
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)


def _zigzag() -> np.ndarray:
    """Zigzag index k -> natural raster index (computed, not transcribed)."""
    order = np.empty(64, dtype=np.int64)
    i = j = 0
    for k in range(64):
        order[k] = i * 8 + j
        if (i + j) % 2 == 0:  # moving up-right
            if j == 7:
                i += 1
            elif i == 0:
                j += 1
            else:
                i -= 1
                j += 1
        else:  # moving down-left
            if i == 7:
                j += 1
            elif j == 0:
                i += 1
            else:
                i += 1
                j -= 1
    return order


_ZZ = _zigzag()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: F = C @ f @ C.T."""
    x = np.arange(8, dtype=np.float64)
    C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    C *= np.sqrt(2.0 / 8.0)
    C[0] *= 1.0 / np.sqrt(2.0)
    return C


_C = _dct_matrix()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _fixed_huffman(symbols: list[int]) -> tuple[dict[int, tuple[int, int]], list[int], list[int]]:
    """Equal-length canonical prefix code over ``symbols``: every symbol
    gets ``L = ceil(log2(n+1))`` bits (the +1 keeps the all-ones code of
    the maximum length unused, as T.81 requires).  Returns
    (symbol -> (code, length), BITS counts, HUFFVAL) for the DHT segment."""
    n = len(symbols)
    L = max(2, int(np.ceil(np.log2(n + 1))))
    table = {s: (i, L) for i, s in enumerate(symbols)}
    bits = [0] * 17
    bits[L] = n
    return table, bits[1:], list(symbols)


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, appended bits) per T.81 magnitude coding."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return (s, v if v > 0 else v + (1 << s) - 1)


def encode_jpeg(img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4") -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF JPEG bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0

    if subsampling == "4:2:0":
        hy, vy = 2, 2
        # pad to even, then 2x2 mean
        ce = _pad_to(cb, 2, 2)
        re = _pad_to(cr, 2, 2)
        cb = ce.reshape(ce.shape[0] // 2, 2, ce.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = re.reshape(re.shape[0] // 2, 2, re.shape[1] // 2, 2).mean(axis=(1, 3))
    elif subsampling == "4:4:4":
        hy, vy = 1, 1
    else:
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")

    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    dc_tab, dc_bits, dc_vals = _fixed_huffman(_DC_SYMS)
    ac_tab, ac_bits, ac_vals = _fixed_huffman(_AC_SYMS)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt.reshape(-1)[_ZZ[k]]) for k in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc, th, bits, vals in ((0, 0, dc_bits, dc_vals), (1, 0, ac_bits, ac_vals),
                               (0, 1, dc_bits, dc_vals), (1, 1, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    bw = _BitWriter()
    planes = [(y, qt_l, hy, vy), (cb, qt_c, 1, 1), (cr, qt_c, 1, 1)]
    mcu_w, mcu_h = 8 * hy, 8 * vy
    ypad = _pad_to(y, mcu_h, mcu_w)
    cbpad = _pad_to(cb, 8, 8)
    crpad = _pad_to(cr, 8, 8)
    mcus_x = ypad.shape[1] // mcu_w
    mcus_y = ypad.shape[0] // mcu_h
    # chroma planes must cover mcus at 8px each
    cbpad = _pad_to(cbpad, mcus_y * 8, mcus_x * 8, absolute=True)
    crpad = _pad_to(crpad, mcus_y * 8, mcus_x * 8, absolute=True)
    pred = [0, 0, 0]

    def put_block(block: np.ndarray, qt: np.ndarray, ci: int) -> None:
        F = _C @ (block - 128.0) @ _C.T
        q = np.round(F / qt).astype(np.int64)
        zz = q.reshape(-1)[_ZZ]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        dct = dc_tab if ci == 0 else dc_tab
        s, bitsv = _magnitude(diff)
        code, ln = dct[s]
        bw.write(code, ln)
        bw.write(bitsv, s)
        act = ac_tab
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, l = act[0xF0]
                bw.write(c, l)
                run -= 16
            s, bitsv = _magnitude(v)
            c, l = act[(run << 4) | s]
            bw.write(c, l)
            bw.write(bitsv, s)
            run = 0
        if run:
            c, l = act[0x00]
            bw.write(c, l)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vy):
                for bx in range(hy):
                    r0, c0 = (my * vy + by) * 8, (mx * hy + bx) * 8
                    put_block(ypad[r0 : r0 + 8, c0 : c0 + 8], qt_l, 0)
            put_block(cbpad[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qt_c, 1)
            put_block(crpad[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qt_c, 2)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _pad_to(plane: np.ndarray, mh: int, mw: int, absolute: bool = False) -> np.ndarray:
    th = mh if absolute else ((plane.shape[0] + mh - 1) // mh) * mh
    tw = mw if absolute else ((plane.shape[1] + mw - 1) // mw) * mw
    if plane.shape == (th, tw):
        return plane
    return np.pad(plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge")


# --------------------------------------------------------------------------
# decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, byte-aligns and reports
    restart markers, stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise _SegmentEnd()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_after_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.pos += 2  # consume the FFDx marker


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _SegmentEnd(Exception):
    pass


class _Huff:
    """Canonical Huffman decode table from a DHT (BITS, HUFFVAL) pair."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = vals[vi]
                vi += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            sym = self.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JFIF JPEG -> (H, W, 3) uint8 RGB.

    General table-driven decoder (see module docstring); raises
    NotImplementedError for arithmetic/lossless/hierarchical frames."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) comps: list of (cid, hf, vf, tq)
    restart_interval = 0
    progressive = False
    coefs: dict[int, np.ndarray] = {}  # cid -> (nby, nbx, 64) zigzag ints
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                bp += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", 64, bp).astype(np.int32)
                    bp += 128
                else:
                    vals = np.frombuffer(body, np.uint8, 64, bp).astype(np.int32)
                    bp += 64
                nat = np.empty(64, np.int32)
                nat[_ZZ] = vals
                qts[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame (SOF marker 0xFF{marker:02X}): "
                "arithmetic/lossless/hierarchical coding; baseline and "
                "progressive Huffman frames are implemented here"
            )
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = body[bp + 17 : bp + 17 + nv]
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(bits, vals)
                bp += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tt = body[1 + si * 2 : 3 + si * 2]
                scan.append((cid, tt >> 4, tt & 15))
            data_start = pos + seglen
            if not progressive:
                return _decode_scan(
                    payload, data_start, frame, scan, qts, dc_tabs, ac_tabs,
                    restart_interval,
                )
            ss = body[1 + ns * 2]
            se = body[2 + ns * 2]
            ahal = body[3 + ns * 2]
            if not coefs:
                coefs = _init_prog_coefs(frame)
            pos = _decode_progressive_scan(
                payload, data_start, frame, scan, ss, se, ahal >> 4, ahal & 15,
                dc_tabs, ac_tabs, restart_interval, coefs,
            )
            continue
        pos += seglen
    if progressive and coefs:
        return _prog_reconstruct(frame, coefs, qts)
    raise ValueError("no SOS segment found")


def _decode_scan(payload, pos, frame, scan, qts, dc_tabs, ac_tabs, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, hf, vf, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vf * 8, mcus_x * hf * 8), dtype=np.float64)
    by_id = {c[0]: c for c in comps}
    tabs = {cid: (dc_tabs[dct], ac_tabs[act]) for cid, dct, act in scan}
    pred = {cid: 0 for cid, _, _ in scan}
    br = _BitReader(payload, pos)
    CT = _C.T
    mcu_index = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # encoder-emitted restart: byte-align, consume marker, reset DC
                try:
                    while True:
                        br.read(1)
                except _RestartMarker:
                    br.align_after_restart()
                    for k in pred:
                        pred[k] = 0
                except _SegmentEnd:
                    pass
            for cid, _dct, _act in scan:
                _cid, hf, vf, tq = by_id[cid]
                dct, act = tabs[cid]
                q = qts[tq]
                for by in range(vf):
                    for bx in range(hf):
                        coef = np.zeros(64, dtype=np.float64)
                        s = dct.decode(br)
                        diff = _extend(br.read(s), s) if s else 0
                        pred[cid] += diff
                        coef[0] = pred[cid] * q.reshape(-1)[0]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            v = _extend(br.read(s), s)
                            coef[_ZZ[k]] = v * q.reshape(-1)[_ZZ[k]]
                            k += 1
                        block = CT @ coef.reshape(8, 8) @ _C + 128.0
                        r0 = (my * vf + by) * 8
                        c0 = (mx * hf + bx) * 8
                        planes[cid][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_index += 1

    # upsample to full resolution and crop
    full = []
    for cid, hf, vf, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vf, axis=0), hmax // hf, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        ych = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([ych, ych, ych], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)

# --------------------------------------------------------------------------
# progressive (SOF2) — ITU-T T.81 Annex G, Huffman path.  Coefficients are
# accumulated across scans in ZIGZAG order per component over the padded
# MCU block grid; non-interleaved scans address only the component's REAL
# block grid (padded-only blocks keep zero AC — they are cropped away).


def _prog_geom(frame):
    """Frame -> (hmax, vmax, mcus_x, mcus_y, per-cid geometry dict with
    (hf, vf, tq, padded nby/nbx, real rbh/rbw))."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    geo = {}
    for cid, hf, vf, tq in comps:
        cw = (fw * hf + hmax - 1) // hmax
        ch = (fh * vf + vmax - 1) // vmax
        geo[cid] = (
            hf, vf, tq,
            mcus_y * vf, mcus_x * hf,           # padded block grid
            (ch + 7) // 8, (cw + 7) // 8,       # real block grid
        )
    return hmax, vmax, mcus_x, mcus_y, geo


def _init_prog_coefs(frame):
    _h, _v, _mx, _my, geo = _prog_geom(frame)
    return {
        cid: np.zeros((nby, nbx, 64), dtype=np.int32)
        for cid, (_hf, _vf, _tq, nby, nbx, _rbh, _rbw) in geo.items()
    }


def _decode_progressive_scan(
    payload, pos, frame, scan, ss, se, ah, al, dc_tabs, ac_tabs,
    restart_interval, coefs,
):
    """Decode one progressive SOS into ``coefs``; returns the stream
    position of the next marker.  Implements T.81 G.2 (the jdphuff
    decision structure): DC first/refine, AC first/refine with EOB runs
    and in-band correction bits."""
    _hmax, _vmax, mcus_x, mcus_y, geo = _prog_geom(frame)
    br = _BitReader(payload, pos)
    state = {"eobrun": 0, "pred": {cid: 0 for cid, _t1, _t2 in scan}}

    def reset():
        state["eobrun"] = 0
        for k in state["pred"]:
            state["pred"][k] = 0

    def maybe_restart(unit_idx):
        if restart_interval and unit_idx and unit_idx % restart_interval == 0:
            try:
                while True:
                    br.read(1)
            except _RestartMarker:
                br.align_after_restart()
                reset()
            except _SegmentEnd:
                pass

    if ss == 0:  # ---- DC scan (interleaved or single-component) ----
        if se != 0:
            raise ValueError("DC scan must have Se == 0")
        if len(scan) > 1:
            units = [
                (cid, my * geo[cid][1] + by, mx * geo[cid][0] + bx)
                for my in range(mcus_y)
                for mx in range(mcus_x)
                for cid, _td, _ta in scan
                for by in range(geo[cid][1])
                for bx in range(geo[cid][0])
            ]
            # restart counting is per MCU: tag each unit with its MCU index
            blocks_per_mcu = sum(geo[cid][0] * geo[cid][1] for cid, _t, _a in scan)
        else:
            cid = scan[0][0]
            _hf, _vf, _tq, _nby, _nbx, rbh, rbw = geo[cid]
            units = [(cid, by, bx) for by in range(rbh) for bx in range(rbw)]
            blocks_per_mcu = 1
        for ui, (cid, by, bx) in enumerate(units):
            if ui % blocks_per_mcu == 0:
                maybe_restart(ui // blocks_per_mcu)
            blk = coefs[cid]
            if ah == 0:
                td = next(t for c, t, _a in scan if c == cid)
                s = dc_tabs[td].decode(br)
                diff = _extend(br.read(s), s) if s else 0
                state["pred"][cid] += diff
                blk[by, bx, 0] = state["pred"][cid] << al
            else:
                if br.read(1):
                    blk[by, bx, 0] |= 1 << al
        return br.pos

    # ---- AC scan: always single-component, band ss..se ----
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, _td, ta = scan[0]
    _hf, _vf, _tq, _nby, _nbx, rbh, rbw = geo[cid]
    ac = ac_tabs[ta]
    p1, m1 = 1 << al, -1 << al

    for ui in range(rbh * rbw):
        maybe_restart(ui)
        by, bx = divmod(ui, rbw)
        blk = coefs[cid][by, bx]
        if ah == 0:  # ---- AC first scan ----
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                continue
            k = ss
            while k <= se:
                rs = ac.decode(br)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += br.read(r)
                        break
                    k += 16
                else:
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow in progressive scan")
                    blk[k] = _extend(br.read(s), s) << al
                    k += 1
            continue
        # ---- AC refinement scan (G.2 / jdphuff structure) ----
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = ac.decode(br)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.read(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    # refinement symbols carry s == 1 only
                    val = p1 if br.read(1) else m1
                while k <= se:
                    if blk[k] != 0:
                        if br.read(1) and (int(blk[k]) & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    if br.read(1) and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1
    return br.pos


def _prog_reconstruct(frame, coefs, qts):
    """Accumulated zigzag coefficients -> (H, W, 3) uint8 RGB: dequantize,
    vectorized IDCT over all blocks, upsample, crop, color-convert (the
    same math as the baseline tail)."""
    fh, fw, comps = frame
    hmax, vmax, _mx, _my, geo = _prog_geom(frame)
    full = []
    for cid, hf, vf, tq in comps:
        zz = coefs[cid].astype(np.float64)
        nby, nbx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[:, :, _ZZ] = zz
        F = nat.reshape(nby, nbx, 8, 8) * qts[tq].astype(np.float64)
        blocks = np.einsum("ba,xybc,cd->xyad", _C, F, _C) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.repeat(np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        ych = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([ych, ych, ych], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive encoder — libjpeg-style scan script (spectral selection +
# one level of successive approximation), per-scan Huffman tables built
# from the symbols each scan actually emits (same fixed-length canonical
# construction as the baseline encoder).


class _ScanOps:
    """Two-pass scan buffer: collect (symbol | raw-bit) ops, then build a
    Huffman table over the emitted symbols and serialize."""

    def __init__(self):
        self.ops: list[tuple] = []

    def sym(self, s: int) -> None:
        self.ops.append(("s", s))

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append(("b", v, n))

    def symbols(self) -> list[int]:
        return sorted({op[1] for op in self.ops if op[0] == "s"})

    def serialize(self, bw: _BitWriter, table: dict[int, tuple[int, int]]) -> None:
        for op in self.ops:
            if op[0] == "s":
                code, ln = table[op[1]]
                bw.write(code, ln)
            else:
                bw.write(op[1], op[2])


def _shift_trunc(v: int, al: int) -> int:
    """T.81 point transform: v / 2^al truncated toward zero."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _prog_component_coefs(img, quality, subsampling):
    """RGB -> (frame params, per-component quantized ZIGZAG coefficient
    arrays over the padded MCU grid) — the same per-block math as
    ``encode_jpeg``'s put_block, vectorized with one einsum per plane."""
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0
    if subsampling == "4:2:0":
        hy, vy = 2, 2
        ce = _pad_to(cb, 2, 2)
        re = _pad_to(cr, 2, 2)
        cb = ce.reshape(ce.shape[0] // 2, 2, ce.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = re.reshape(re.shape[0] // 2, 2, re.shape[1] // 2, 2).mean(axis=(1, 3))
    elif subsampling == "4:4:4":
        hy, vy = 1, 1
    else:
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    ypad = _pad_to(y, 8 * vy, 8 * hy)
    mcus_x = ypad.shape[1] // (8 * hy)
    mcus_y = ypad.shape[0] // (8 * vy)
    cbpad = _pad_to(_pad_to(cb, 8, 8), mcus_y * 8, mcus_x * 8, absolute=True)
    crpad = _pad_to(_pad_to(cr, 8, 8), mcus_y * 8, mcus_x * 8, absolute=True)

    def blockify(plane, qt):
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        F = np.einsum("ab,xybc,dc->xyad", _C, blocks - 128.0, _C)
        q = np.round(F / qt.astype(np.float64)).astype(np.int64)
        return q.reshape(nby, nbx, 64)[:, :, _ZZ]

    coefs = [blockify(ypad, qt_l), blockify(cbpad, qt_c), blockify(crpad, qt_c)]
    return h, w, hy, vy, qt_l, qt_c, coefs


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4"
) -> bytes:
    """(H, W, 3) uint8 RGB -> PROGRESSIVE (SOF2) JFIF JPEG bytes.

    Scan script (libjpeg-shaped; exercises every Annex-G decode path):
    DC first at Al=1 (interleaved), per-component AC first scans at Al=1
    with the luma band split 1-5 / 6-63, then DC refinement (Ah=1) and
    per-component AC refinement scans (Ah=1 -> Al=0) with EOB runs and
    buffered correction bits.  The quantized coefficients are identical
    to ``encode_jpeg``'s, so decoding both encodings of the same image
    yields byte-identical pixels — the roundtrip oracle the tests pin."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB")
    h, w, hy, vy, qt_l, qt_c, coefs = _prog_component_coefs(img, quality, subsampling)
    mcus_y, _nbx = coefs[0].shape[0] // vy, None
    mcus_x = coefs[0].shape[1] // hy
    samp = [(hy, vy), (1, 1), (1, 1)]
    # real (non-padded) block grids, per component
    real = []
    for ci, (hf, vf) in enumerate(samp):
        cw = (w * hf + hy - 1) // hy
        ch = (h * vf + vy - 1) // vy
        real.append(((ch + 7) // 8, (cw + 7) // 8))

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt.reshape(-1)[_ZZ[k]]) for k in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1])

    def emit_scan(ops, scan_comps, ss, se, ah, al, table_class):
        """DHT (if the scan has symbols) + SOS + entropy data."""
        syms = ops.symbols()
        if syms:
            table, bits, vals = _fixed_huffman(syms)
            out.extend(b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (table_class << 4) | 0))
            out.extend(bytes(bits) + bytes(vals))
        else:
            table = {}
        ns = len(scan_comps)
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for ci in scan_comps:
            out.extend(bytes([ci + 1, 0x00]))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        bw = _BitWriter()
        ops.serialize(bw, table)
        bw.flush()
        out.extend(bw.out)

    # ---- scan 1: DC first, interleaved, Al=1 ----
    al = 1
    ops = _ScanOps()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hf, vf) in enumerate(samp):
                for by in range(vf):
                    for bx in range(hf):
                        v = int(coefs[ci][my * vf + by, mx * hf + bx, 0]) >> al
                        diff = v - pred[ci]
                        pred[ci] = v
                        s, bitsv = _magnitude(diff)
                        ops.sym(s)
                        ops.bits(bitsv, s)
    emit_scan(ops, [0, 1, 2], 0, 0, 0, al, 0)

    # ---- AC first scans, Al=1 ----
    def ac_first(ci, ss, se, al):
        ops = _ScanOps()
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ops.sym(nbits << 4)
                if nbits:
                    ops.bits(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        rbh, rbw = real[ci]
        for ui in range(rbh * rbw):
            by, bx = divmod(ui, rbw)
            blk = coefs[ci][by, bx]
            t = [_shift_trunc(int(blk[k]), al) for k in range(ss, se + 1)]
            if not any(t):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            r = 0
            for off, v in enumerate(t):
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    ops.sym(0xF0)
                    r -= 16
                s, bitsv = _magnitude(v)
                ops.sym((r << 4) | s)
                ops.bits(bitsv, s)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
        flush()
        emit_scan(ops, [ci], ss, se, 0, al, 1)

    ac_first(0, 1, 5, 1)
    ac_first(1, 1, 63, 1)
    ac_first(2, 1, 63, 1)
    ac_first(0, 6, 63, 1)

    # ---- DC refinement: Ah=1 -> Al=0, interleaved, raw bits ----
    ops = _ScanOps()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hf, vf) in enumerate(samp):
                for by in range(vf):
                    for bx in range(hf):
                        ops.bits(int(coefs[ci][my * vf + by, mx * hf + bx, 0]) & 1, 1)
    emit_scan(ops, [0, 1, 2], 0, 0, 1, 0, 0)

    # ---- AC refinement scans: Ah=1 -> Al=0 (jcphuff structure) ----
    def ac_refine(ci, ss, se, al):
        ops = _ScanOps()
        eobrun = 0
        eob_bits: list[int] = []

        def flush():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ops.sym(nbits << 4)
                if nbits:
                    ops.bits(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
                for b in eob_bits:
                    ops.bits(b, 1)
                eob_bits.clear()

        rbh, rbw = real[ci]
        for ui in range(rbh * rbw):
            by, bx = divmod(ui, rbw)
            blk = coefs[ci][by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eobpos = ss - 1
            for off, t in enumerate(absv):
                if t == 1:
                    eobpos = ss + off
            r = 0
            pending: list[int] = []
            for off, t in enumerate(absv):
                k = ss + off
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    flush()
                    ops.sym(0xF0)
                    r -= 16
                    for b in pending:
                        ops.bits(b, 1)
                    pending = []
                if t > 1:
                    pending.append(t & 1)
                    continue
                flush()
                ops.sym((r << 4) | 1)
                ops.bits(0 if int(blk[k]) < 0 else 1, 1)
                for b in pending:
                    ops.bits(b, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                eobrun += 1
                eob_bits.extend(pending)
                if eobrun == 0x7FFF or len(eob_bits) > 930:
                    flush()
        flush()
        emit_scan(ops, [ci], ss, se, 1, al, 1)

    ac_refine(0, 1, 63, 0)
    ac_refine(1, 1, 63, 0)
    ac_refine(2, 1, 63, 0)

    out += b"\xff\xd9"
    return bytes(out)
