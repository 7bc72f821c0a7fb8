import os, time
import numpy as np, jax
from tfhe_tpu.utils import enable_persistent_cache
enable_persistent_cache()
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_KS_PBS as P
from tfhe_tpu.shortint.client_key import ClientKey

t0 = time.time(); cks = ClientKey(P, seed=99); print("client key:", round(time.time()-t0,1), flush=True)
t0 = time.time()
d = np.load(".keycache/PARAM_MESSAGE_2_CARRY_2_KS_PBS_s99.npz")
bsk, ksk = d["bsk"], d["ksk"]
print("npz load:", round(time.time()-t0,1), bsk.shape, bsk.nbytes>>20, "MB", flush=True)
from tfhe_tpu import core
t0 = time.time()
fb = core.prepare_bsk_fused(bsk, P.pbs_base_log)
fb.khi.block_until_ready()
print("prepare_bsk_fused:", round(time.time()-t0,1), flush=True)
t0 = time.time()
pk = core.prepare_ksk(ksk, P.ks_base_log)
pk.limbs.block_until_ready()
print("prepare_ksk:", round(time.time()-t0,1), flush=True)
# fresh keygen from scratch (host AES + device phase) timing
t0 = time.time()
cks2 = ClientKey(P, seed=123)
b2 = core.generate_bootstrap_key(cks2.lwe_sk, cks2.glwe_sk, P.pbs_base_log,
                                 P.pbs_level, P.glwe_modular_std_dev, cks2.enc_gen)
print("generate_bootstrap_key:", round(time.time()-t0,1), flush=True)
t0 = time.time()
k2 = core.generate_keyswitch_key(cks2.big_sk, cks2.lwe_sk, P.ks_base_log,
                                 P.ks_level, P.lwe_modular_std_dev, cks2.enc_gen)
print("generate_keyswitch_key:", round(time.time()-t0,1), flush=True)
