"""Example applications built on the scheme layers.

TPU equivalents of the reference's example programs
(ref: tfhe/examples/ — sha256_bool, dark_market, regex_engine — and
apps/trivium), re-designed around the batched TPU APIs: gate batches over
whole bit-vectors instead of rayon joins over scalar gates.
"""
