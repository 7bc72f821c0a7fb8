"""Parameter-catalog fidelity: every transcribed row equals the reference.

Re-parses the Rust constant tables in /root/reference (read-only) and
compares field-by-field against tfhe_tpu.params — guarding both the
transcription tool and any hand edits (SURVEY §2 #29: parameter sets are
copied verbatim)."""

import os

import pytest

from tools.transcribe_params import REF, parse

from tfhe_tpu.params import (compact_pk_params, multi_bit_params,
                             wopbs_params)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present")

_NUM_FIELDS = [
    "lwe_dimension", "glwe_dimension", "polynomial_size",
    "pbs_base_log", "pbs_level", "ks_base_log", "ks_level",
    "message_modulus", "carry_modulus",
]
_STD_FIELDS = ["lwe_modular_std_dev", "glwe_modular_std_dev"]


def _check(sources, module, extra_num=(), extra_std=()):
    rust = {}
    for src in sources:
        for name, _typ, fields in parse(src):
            if "lwe_dimension" in fields:
                rust[name] = fields
    checked = 0
    for prm in module.ALL:
        f = rust[prm.name]
        for k in list(_NUM_FIELDS) + list(extra_num):
            assert getattr(prm, k) == int(f[k]), (prm.name, k)
        for k in list(_STD_FIELDS) + list(extra_std):
            assert getattr(prm, k) == float(f[k]), (prm.name, k)
        want_ekc = f.get("encryption_key_choice", "BIG")
        assert prm.encryption_key_choice.name == want_ekc, prm.name
        checked += 1
    assert checked == len(module.ALL) and checked > 0


def test_wopbs_catalog_matches_reference():
    _check(
        [f"{REF}/parameters_wopbs.rs",
         f"{REF}/parameters_wopbs_message_carry.rs",
         f"{REF}/parameters_wopbs_prime_moduli.rs"],
        wopbs_params,
        extra_num=("pfks_base_log", "pfks_level", "cbs_base_log",
                   "cbs_level"),
        extra_std=("pfks_modular_std_dev",),
    )
    assert len(wopbs_params.ALL) >= 116  # ALL_PARAMETER_VEC_WOPBS size


def test_compact_pk_catalog_matches_reference():
    _check([f"{REF}/parameters_compact_pk.rs"], compact_pk_params)
    assert len(compact_pk_params.ALL) == 56  # ALL_PARAMETER_VEC_COMPACT_PK


def test_multi_bit_catalog_matches_reference():
    _check([f"{REF}/multi_bit.rs"], multi_bit_params,
           extra_num=("grouping_factor",))
    assert len(multi_bit_params.ALL) == 6  # ALL_MULTI_BIT_PARAMETER_VEC


def test_catalog_registered():
    from tfhe_tpu.params import ALL_PARAMETER_SETS, get_parameters

    assert len(ALL_PARAMETER_SETS) >= 190
    p = get_parameters("WOPBS_PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    assert p.polynomial_size == 2048
