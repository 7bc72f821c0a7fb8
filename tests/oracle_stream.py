"""Independent oracle for the concrete-csprng stream semantics.

A from-scratch AES-128 (no tables shared with tfhe_tpu.prng.aes) plus a
literal transcription of the reference's AES-CTR table semantics:

- table[i] = AES_k(LE_bytes(i // 16))[i % 16] — the counter is the AesIndex
  encrypted as native-endian (little-endian) bytes
  (ref: concrete-csprng/src/generators/implem/soft/block_cipher.rs:51
  to_ne_bytes; aesni/block_cipher.rs uses the same layout via si128);
- fresh roots start at absolute byte 1 (TableIndex::SECOND,
  ref: aes_ctr/index.rs:27-31, generic.rs:43-56);
- try_fork(n, b): child i owns [cur + i*b, cur + (i+1)*b), parent jumps
  past all children (ref: aes_ctr/generic.rs:120-170);
- gaussian pairs: 8 LE bytes u then 8 LE bytes v per attempt, i64 scaled
  by 2^-63, polar Box-Muller accepted when 0 < u^2+v^2 < 1
  (ref: core_crypto/commons/math/random/gaussian.rs:17-49).

Anchored by the FIPS-197 appendix-C KAT before use (test_golden_stream).
"""

from __future__ import annotations

import math

_SBOX = None


def _build_sbox():
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # multiplicative inverse in GF(2^8) + affine transform, from first
    # principles (AES spec section 5.1.1)
    def xtime(a):
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        return a & 0xFF

    def gmul(a, b):
        r = 0
        while b:
            if b & 1:
                r ^= a
            a_next = xtime(a)
            a, b = a_next, b >> 1
        return r

    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if gmul(x, y) == 1:
                inv[x] = y
                break
    sbox = []
    for x in range(256):
        b = inv[x]
        s = 0
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))
                   ^ (0x63 >> i)) & 1
            s |= bit << i
        sbox.append(s)
    _SBOX = sbox
    return sbox


def _xtime(a):
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def aes128_encrypt(key: bytes, block: bytes) -> bytes:
    sbox = _build_sbox()
    rcon = 1
    words = [list(key[4 * i:4 * i + 4]) for i in range(4)]
    for r in range(10):
        t = list(words[-1])
        t = t[1:] + t[:1]
        t = [sbox[b] for b in t]
        t[0] ^= rcon
        rcon = _xtime(rcon)
        for i in range(4):
            t = [a ^ b for a, b in zip(words[-4], t)]
            words.append(t)
    state = [list(block[4 * i:4 * i + 4]) for i in range(4)]  # column-major

    def add_rk(st, rnd):
        return [[a ^ b for a, b in zip(st[c], words[4 * rnd + c])]
                for c in range(4)]

    def sub_shift_mix(st, mix):
        st = [[sbox[b] for b in col] for col in st]
        # rows are st[c][r]; shiftrows: row r rotates left by r
        ns = [[st[(c + r) % 4][r] for r in range(4)] for c in range(4)]
        if not mix:
            return ns
        out = []
        for col in ns:
            a = col
            out.append([
                _xtime(a[0]) ^ (_xtime(a[1]) ^ a[1]) ^ a[2] ^ a[3],
                a[0] ^ _xtime(a[1]) ^ (_xtime(a[2]) ^ a[2]) ^ a[3],
                a[0] ^ a[1] ^ _xtime(a[2]) ^ (_xtime(a[3]) ^ a[3]),
                (_xtime(a[0]) ^ a[0]) ^ a[1] ^ a[2] ^ _xtime(a[3]),
            ])
        return out

    st = add_rk(state, 0)
    for rnd in range(1, 10):
        st = add_rk(sub_shift_mix(st, True), rnd)
    st = add_rk(sub_shift_mix(st, False), 10)
    return bytes(b for col in st for b in col)


class OracleStream:
    """Reference-semantics stream: absolute byte window over the table."""

    def __init__(self, key_u128: int, start: int = 1):
        # AesKey(u128) reaches the cipher as to_ne_bytes = the u128's
        # LITTLE-endian bytes (ref: soft/block_cipher.rs:16; the FIPS test
        # keys are written u128::from_be(literal) precisely so their
        # memory/ne bytes equal the published byte sequence)
        self.key = key_u128.to_bytes(16, "little")
        self.cur = start

    def _table(self, i: int) -> int:
        ctr = (i // 16) % (1 << 128)
        pt = ctr.to_bytes(16, "little")          # to_ne_bytes on x86
        return aes128_encrypt(self.key, pt)[i % 16]

    def next_bytes(self, n: int) -> bytes:
        out = bytes(self._table(self.cur + j) for j in range(n))
        self.cur += n
        return out

    def fork(self, n_children: int, bytes_per_child: int):
        kids = []
        for i in range(n_children):
            c = OracleStream.__new__(OracleStream)
            c.key = self.key
            c.cur = self.cur + i * bytes_per_child
            kids.append(c)
        self.cur += n_children * bytes_per_child
        return kids

    def gaussian_pairs(self, n_pairs: int, std: float):
        out = []
        while len(out) < 2 * n_pairs:
            u = int.from_bytes(self.next_bytes(8), "little", signed=True)
            v = int.from_bytes(self.next_bytes(8), "little", signed=True)
            uf = u * 2.0 ** -63
            vf = v * 2.0 ** -63
            s = uf * uf + vf * vf
            if 0.0 < s < 1.0:
                cst = std * math.sqrt(-2.0 * math.log(s) / s)
                out.extend([uf * cst, vf * cst])
        return out
