"""The docs' code paths, executed with toy params (doc-test analog of the
reference's doctested user guide, tfhe/docs/)."""

import numpy as np
import pytest

from tfhe_tpu.params import (BOOLEAN_TEST_PARAMETERS,
                             PARAM_MESSAGE_2_CARRY_2_TEST)

pytestmark = pytest.mark.slow


def test_getting_started_high_level():
    from tfhe_tpu import api

    config = (api.ConfigBuilder.default()
              .use_custom_parameters(PARAM_MESSAGE_2_CARRY_2_TEST).build())
    client_key, server_key = api.generate_keys(config, seed=0)
    api.set_server_key(server_key)
    a = api.FheUint8.encrypt(123, client_key)
    b = api.FheUint8.encrypt(89, client_key)
    assert (a + b).decrypt(client_key) == (123 + 89) % 256
    assert not a.eq(b).decrypt(client_key)
    assert ((a >> 2) & b).decrypt(client_key) == (123 >> 2) & 89


def test_getting_started_boolean_and_shortint():
    from tfhe_tpu import boolean, shortint

    cks, sks = boolean.gen_keys(BOOLEAN_TEST_PARAMETERS, seed=1)
    a = cks.encrypt_batch(np.array([True, False]))
    b = cks.encrypt_batch(np.array([True, True]))
    assert cks.decrypt_batch(sks.and_batch(a, b)).tolist() == [True, False]

    cks, sks = shortint.gen_keys(PARAM_MESSAGE_2_CARRY_2_TEST, seed=2)
    lut = sks.generate_lookup_table(lambda x: (3 * x + 1) % 4)
    assert cks.decrypt(sks.apply_lookup_table(cks.encrypt(2), lut)) == 3


def test_how_to_integer_and_batched():
    from tfhe_tpu import integer
    from tfhe_tpu.integer.batched import (BatchedRadixOps,
                                          decrypt_batch_radix,
                                          encrypt_batch_radix)

    icks, isks = integer.gen_keys_radix(PARAM_MESSAGE_2_CARRY_2_TEST, 4,
                                        seed=0)
    s = isks.add_parallelized(icks.encrypt(200), icks.encrypt(99))
    assert icks.decrypt(s) == (200 + 99) % 256

    ops = BatchedRadixOps(isks.key)
    a = encrypt_batch_radix(icks, [5, 250], 4)
    b = encrypt_batch_radix(icks, [9, 10], 4)
    assert decrypt_batch_radix(icks, ops.add(a, b)) == [14, (260) % 256]


def test_how_to_strings():
    from tfhe_tpu import strings

    cks, sks = strings.gen_keys_test(seed=0)
    s = cks.encrypt_str("ab cd")
    assert bool(cks.integer_key.decrypt_bool(sks.contains(s, "cd")))
    assert cks.decrypt_string(sks.to_uppercase(s)) == "AB CD"
    found, idx = sks.find(s, "cd")
    assert cks.integer_key.decrypt(idx) == 3
