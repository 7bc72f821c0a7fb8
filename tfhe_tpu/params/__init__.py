"""Cryptographic parameter sets.

TPU equivalent of the reference's typed parameter newtypes and named constant
sets (ref: tfhe/src/core_crypto/commons/parameters.rs:1-245 and
tfhe/src/shortint/parameters/mod.rs, tfhe/src/boolean/parameters/mod.rs).
Parameter *values* are reproduced verbatim — they define the cryptographic
contract (128-bit security, failure probability <= 2^-40) and the test vectors.
"""

from .types import (
    ClassicPBSParameters,
    WopbsParameters,
    BooleanParameters,
    MultiBitPBSParameters,
    EncryptionKeyChoice,
    PBSOrder,
)
from .shortint_params import (
    PARAM_MESSAGE_1_CARRY_0_KS_PBS,
    PARAM_MESSAGE_1_CARRY_1_KS_PBS,
    PARAM_MESSAGE_2_CARRY_1_KS_PBS,
    PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    PARAM_MESSAGE_3_CARRY_1_KS_PBS,
    PARAM_MESSAGE_3_CARRY_3_KS_PBS,
    PARAM_MESSAGE_4_CARRY_0_KS_PBS,
    PARAM_MESSAGE_4_CARRY_4_KS_PBS,
    PARAM_MESSAGE_2_CARRY_2_TEST,
    PARAM_MESSAGE_1_CARRY_1_TEST,
    PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST,
    PARAM_MESSAGE_2_CARRY_2_COMPACT_PK_KS_PBS,
    PARAM_MESSAGE_2_CARRY_2_COMPACT_PK_PBS_KS,
    PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_KS_PBS,
    PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS,
    PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_TEST,
    WOPBS_PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    WOPBS_PARAM_MESSAGE_2_CARRY_2_TEST,
    ALL_PARAMETER_SETS,
    get_parameters,
)
from . import compact_pk_params, multi_bit_params, wopbs_params
from .boolean_params import (
    DEFAULT_PARAMETERS,
    DEFAULT_PARAMETERS_KS_PBS,
    PARAMETERS_ERROR_PROB_2_POW_MINUS_165,
    PARAMETERS_ERROR_PROB_2_POW_MINUS_165_KS_PBS,
    TFHE_LIB_PARAMETERS,
    BOOLEAN_TEST_PARAMETERS,
    BOOLEAN_SHA_TEST_PARAMETERS,
)

__all__ = [
    "ClassicPBSParameters",
    "BooleanParameters",
    "MultiBitPBSParameters",
    "EncryptionKeyChoice",
    "PBSOrder",
    "PARAM_MESSAGE_1_CARRY_0_KS_PBS",
    "PARAM_MESSAGE_1_CARRY_1_KS_PBS",
    "PARAM_MESSAGE_2_CARRY_1_KS_PBS",
    "PARAM_MESSAGE_2_CARRY_2_KS_PBS",
    "PARAM_MESSAGE_3_CARRY_1_KS_PBS",
    "PARAM_MESSAGE_3_CARRY_3_KS_PBS",
    "PARAM_MESSAGE_4_CARRY_0_KS_PBS",
    "PARAM_MESSAGE_4_CARRY_4_KS_PBS",
    "PARAM_MESSAGE_2_CARRY_2_TEST",
    "PARAM_MESSAGE_1_CARRY_1_TEST",
    "PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST",
    "PARAM_MESSAGE_2_CARRY_2_COMPACT_PK_KS_PBS",
    "PARAM_MESSAGE_2_CARRY_2_COMPACT_PK_PBS_KS",
    "PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_KS_PBS",
    "PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS",
    "PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_2_TEST",
    "WopbsParameters",
    "WOPBS_PARAM_MESSAGE_2_CARRY_2_KS_PBS",
    "WOPBS_PARAM_MESSAGE_2_CARRY_2_TEST",
    "ALL_PARAMETER_SETS",
    "get_parameters",
    "wopbs_params",
    "compact_pk_params",
    "multi_bit_params",
    "DEFAULT_PARAMETERS",
    "DEFAULT_PARAMETERS_KS_PBS",
    "PARAMETERS_ERROR_PROB_2_POW_MINUS_165",
    "PARAMETERS_ERROR_PROB_2_POW_MINUS_165_KS_PBS",
    "TFHE_LIB_PARAMETERS",
    "BOOLEAN_TEST_PARAMETERS",
    "BOOLEAN_SHA_TEST_PARAMETERS",
]
