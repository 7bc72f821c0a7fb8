"""Golden-vector bit-exactness (SURVEY §4 test strategy anchor).

Every fixture in tests/golden/*.json is checked against this framework:
- selfgen.json locks the current PRNG/keygen/encryption bytes (regression
  guard, produced by tools/dump_vectors.py);
- reference.json, when present, is produced by tools/dump_vectors.rs inside
  the tfhe-rs reference tree (cargo required) and makes the comparison a
  true cross-implementation bit-exactness proof.  Tests auto-skip for
  fixture files that are absent.

Additionally a pure-Python FIPS-197 AES (third, independent implementation)
cross-checks the production AES on random keys/blocks.
"""

import glob
import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))


def _load(path):
    with open(path) as f:
        return json.load(f)


@pytest.fixture(params=FIXTURES or [None],
                ids=[os.path.basename(p) for p in FIXTURES] or ["none"])
def fixture(request):
    if request.param is None:
        pytest.skip("no golden fixtures present")
    return _load(request.param)


def test_stream_vectors(fixture):
    from tfhe_tpu.prng.stream import AesCtrStream

    for vec in fixture.get("streams", []):
        seed = int(vec["seed"])
        gen = AesCtrStream(seed)
        got = bytes(gen.next_bytes(len(vec["first_bytes"]) // 2)).hex()
        assert got == vec["first_bytes"], f"stream bytes differ, seed {seed}"
        for fork in vec.get("forks", []):
            gen2 = AesCtrStream(seed)
            children = gen2.try_fork(fork["n_children"],
                                     fork["bytes_per_child"])
            for i, want in enumerate(fork["child_bytes"]):
                got = bytes(children[i].next_bytes(
                    fork["bytes_per_child"])).hex()
                assert got == want, f"fork child {i} differs, seed {seed}"
            got = bytes(gen2.next_bytes(
                len(fork["parent_next"]) // 2)).hex()
            assert got == fork["parent_next"], f"parent-after-fork, {seed}"


def test_secret_key_vectors(fixture):
    from tfhe_tpu.prng.generators import SecretRandomGenerator

    for vec in fixture.get("secret_keys", []):
        gen = SecretRandomGenerator(int(vec["seed"]))
        bits = gen.random_binary(vec["lwe_dimension"]).astype(np.uint8)
        assert bytes(bits).hex() == vec["bits"]


def test_lwe_encryption_vectors(fixture):
    from tfhe_tpu import core
    from tfhe_tpu.prng.generators import (EncryptionRandomGenerator,
                                          SecretRandomGenerator)
    from tfhe_tpu.prng.stream import Seeder

    for vec in fixture.get("lwe_encryptions", []):
        sk = core.generate_binary_lwe_secret_key(
            vec["lwe_dimension"], SecretRandomGenerator(int(vec["secret_seed"])))
        enc = EncryptionRandomGenerator(int(vec["enc_seed"]),
                                        Seeder(int(vec["enc_seed"])))
        ct = np.asarray(core.encrypt_lwe(
            sk, np.asarray([int(vec["plaintext"])], np.uint64),
            vec["std_dev"], enc))[0]
        want = np.array([int(w) for w in vec["ct"]], dtype=np.uint64)
        assert np.array_equal(ct, want)


# ---------------------------------------------------------------------------
# independent pure-Python AES-128 (FIPS-197), used as a third implementation
# ---------------------------------------------------------------------------

_SBOX = None


def _sbox():
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # generate the AES S-box from GF(2^8) inversion + affine map (FIPS-197 §5.1.1)
    p, q, sbox = 1, 1, [0] * 256
    while True:
        # p := p * 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q := q / 3
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        q ^= 0x09 if q & 0x80 else 0
        xformed = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (xformed ^ 0x63) & 0xFF
        if p == 1:
            break
    sbox[0] = 0x63
    _SBOX = sbox
    return sbox


def _aes128_encrypt_py(key: bytes, block: bytes) -> bytes:
    sbox = _sbox()
    Nk, Nr = 4, 10

    def xtime(a):
        return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1

    w = [list(key[4 * i:4 * i + 4]) for i in range(Nk)]
    rcon = 1
    for i in range(Nk, 4 * (Nr + 1)):
        t = list(w[i - 1])
        if i % Nk == 0:
            t = t[1:] + t[:1]
            t = [sbox[b] for b in t]
            t[0] ^= rcon
            rcon = xtime(rcon)
        w.append([a ^ b for a, b in zip(w[i - Nk], t)])

    state = [list(block[4 * i:4 * i + 4]) for i in range(4)]

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                state[c][r] ^= w[4 * rnd + c][r]

    def sub_shift():
        flat = [[sbox[state[c][r]] for r in range(4)] for c in range(4)]
        for r in range(4):
            for c in range(4):
                state[c][r] = flat[(c + r) % 4][r]

    def mix_columns():
        for c in range(4):
            a = state[c]
            t = a[0] ^ a[1] ^ a[2] ^ a[3]
            u = a[0]
            state[c] = [
                a[0] ^ t ^ xtime(a[0] ^ a[1]),
                a[1] ^ t ^ xtime(a[1] ^ a[2]),
                a[2] ^ t ^ xtime(a[2] ^ a[3]),
                a[3] ^ t ^ xtime(a[3] ^ u),
            ]

    add_round_key(0)
    for rnd in range(1, Nr):
        sub_shift()
        mix_columns()
        add_round_key(rnd)
    sub_shift()
    add_round_key(Nr)
    return bytes(b for col in state for b in col)


def test_pure_python_aes_fips_kat():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    want = "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _aes128_encrypt_py(key, pt).hex() == want


def test_production_aes_matches_pure_python():
    """Triple-check: numpy/native AES == independent pure-Python AES on
    random keys and counter blocks (ref vectors:
    concrete-csprng/src/generators/implem/aesni/block_cipher.rs:189-210)."""
    from tfhe_tpu.prng.aes import Aes128

    rng = np.random.default_rng(5)
    for _ in range(4):
        key = int.from_bytes(rng.bytes(16), "little")
        a = Aes128(key)
        start = int(rng.integers(0, 1 << 48))
        got = a.ctr_blocks(start, 3)
        key_bytes = key.to_bytes(16, "little")
        for i in range(3):
            ctr = (start + i).to_bytes(16, "little")
            want = _aes128_encrypt_py(key_bytes, ctr)
            assert bytes(got[16 * i:16 * (i + 1)]) == want


# ---------------------------------------------------------------------------
# reference-transcribed KATs (tests/golden/reference_kats.json): constants
# copied verbatim from the reference tree, citations inside the fixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_kats():
    path = os.path.join(GOLDEN_DIR, "reference_kats.json")
    return _load(path)


def test_reference_aes_key_schedule(ref_kats):
    """FIPS-197 key schedule KAT, transcribed from
    concrete-csprng/src/generators/implem/aesni/block_cipher.rs:189-202."""
    from tfhe_tpu.prng.aes import key_expansion

    kat = ref_kats["aes128_fips197"]
    rks = key_expansion(bytes.fromhex(kat["cipher_key"]))
    for want, got in zip(kat["key_schedule"], rks):
        assert bytes(got).hex() == want


def test_reference_aes_block_encrypt(ref_kats):
    """FIPS-197 single-block KAT, transcribed from
    concrete-csprng/src/generators/implem/aesni/block_cipher.rs:203-205
    (test_encrypt_many_messages checks the same pair 8 lanes wide)."""
    from tfhe_tpu.prng.aes import encrypt_blocks_numpy, key_expansion

    kat = ref_kats["aes128_fips197"]
    rks = key_expansion(bytes.fromhex(kat["cipher_key"]))
    blocks = np.frombuffer(
        bytes.fromhex(kat["plaintext"]) * 8, dtype=np.uint8).reshape(8, 16)
    out = encrypt_blocks_numpy(rks, blocks.copy())
    for row in out:
        assert bytes(row).hex() == kat["ciphertext"]


def test_reference_aes_block_native(ref_kats):
    """Same FIPS-197 block KAT through Aes128 (native C path when built):
    counter value chosen so the CTR block equals the KAT plaintext."""
    from tfhe_tpu.prng.aes import Aes128

    kat = ref_kats["aes128_fips197"]
    key = int.from_bytes(bytes.fromhex(kat["cipher_key"]), "little")
    ctr = int.from_bytes(bytes.fromhex(kat["plaintext"]), "little")
    got = Aes128(key).ctr_blocks(ctr, 1)
    assert bytes(got).hex() == kat["ciphertext"]


def test_reference_boolean_encoding(ref_kats):
    """Boolean torus encoding constants (tfhe/src/boolean/mod.rs:74-80)."""
    from tfhe_tpu.boolean import PLAINTEXT_FALSE, PLAINTEXT_TRUE

    enc = ref_kats["boolean_encoding"]
    assert int(PLAINTEXT_TRUE) == enc["plaintext_true_u32"]
    assert int(PLAINTEXT_FALSE) == enc["plaintext_false_u32"]


def test_reference_decomposition_properties():
    """Transcription of commons/math/decomposition/tests.rs properties over
    the same decomposer sweep (tests.rs:14-30 valid_decomposers):
    recompose == closest_representable (tests.rs:60-65), digits within
    +/- half-basis (tests.rs:44-59), epsilon-stability of rounding
    (tests.rs:78-103), and idempotence (tests.rs:113-127)."""
    from tfhe_tpu.ops.decomposition import (np_closest_representable,
                                            recompose, signed_decompose)

    rng = np.random.default_rng(1234)
    for bits in (32, 64):
        decomposers = [(bl, lc)
                       for bl in range(1, bits)
                       for lc in range(1, bits)
                       if bl * lc < bits][:200]
        for base_log, levels in decomposers:
            x = rng.integers(0, 1 << bits, 8, dtype=np.uint64)
            if bits == 32:
                x = x.astype(np.uint32)
            digits = signed_decompose(x, base_log, levels, bits=bits)
            digits = np.asarray(digits)
            half = 1 << (base_log - 1)
            assert np.all(digits >= -half) and np.all(digits <= half)
            closest = np_closest_representable(x, base_log, levels, bits=bits)
            rec = np.asarray(recompose(digits, base_log, levels, bits=bits))
            assert np.array_equal(rec, closest)
            # epsilon-stability: +/- half-gap does not change the rounding
            eps_shift = bits - base_log * levels - 1
            eps = (np.uint64(1) << np.uint64(eps_shift)) // np.uint64(2)
            eps = closest.dtype.type(eps)
            assert np.array_equal(
                np_closest_representable(closest + eps, base_log, levels,
                                         bits=bits), closest)
            assert np.array_equal(
                np_closest_representable(closest - eps, base_log, levels,
                                         bits=bits), closest)
            # idempotence
            assert np.array_equal(
                np_closest_representable(closest, base_log, levels,
                                         bits=bits), closest)
