"""Transcribe the reference's parameter-set constants into Python modules.

Parameter rows are numeric crypto constants; SURVEY §2 component #29
mandates copying them verbatim (they define the bit-exact test vectors and
the security level).  This tool parses the Rust struct literals in
/root/reference/tfhe/src/shortint/parameters/*.rs and emits python rows
for the dataclasses in tfhe_tpu/params/types.py.

Usage: python tools/transcribe_params.py  (writes tfhe_tpu/params/
{wopbs_params.py, compact_pk_params.py} and prints a summary).
"""

from __future__ import annotations

import re
import sys

REF = "/root/reference/tfhe/src/shortint/parameters"

STRUCT_RE = re.compile(
    r"pub const (\w+):\s*(\w+)\s*=\s*(?:\w+\s*)?\{(.*?)\};", re.S)
FIELD_RE = re.compile(r"(\w+):\s*([^,\n]+),")


def parse(path):
    text = open(path).read()
    for m in STRUCT_RE.finditer(text):
        name, typ, body = m.groups()
        fields = {}
        for fm in FIELD_RE.finditer(body):
            k, v = fm.group(1), fm.group(2).strip()
            if "new_native" in v:
                fields[k] = "native"
            elif "EncryptionKeyChoice::" in v:
                fields[k] = v.split("::")[-1].upper()
            else:
                num = re.search(r"\(([-0-9e.E]+)\)", v)
                if num:
                    fields[k] = num.group(1)
                elif re.match(r"^-?[0-9]", v):
                    fields[k] = v
                elif v in ("true", "false"):
                    fields[k] = v == "true"
                else:
                    fields[k] = v
        yield name, typ, fields


def emit_row(name, typ, f, cls):
    keys = [
        "lwe_dimension", "glwe_dimension", "polynomial_size",
        "lwe_modular_std_dev", "glwe_modular_std_dev",
        "pbs_base_log", "pbs_level", "ks_base_log", "ks_level",
    ]
    if cls == "WopbsParameters":
        keys += ["pfks_base_log", "pfks_level", "pfks_modular_std_dev",
                 "cbs_base_log", "cbs_level"]
    keys += ["message_modulus", "carry_modulus"]
    if cls == "MultiBitPBSParameters":
        keys += ["grouping_factor"]
    lines = [f"{name} = {cls}(", f'    name="{name}",']
    for k in keys:
        lines.append(f"    {k}={f[k]},")
    ekc = f.get("encryption_key_choice", "BIG")
    if ekc != "BIG":
        lines.append(f"    encryption_key_choice=EncryptionKeyChoice.{ekc},")
    lines.append(")")
    return "\n".join(lines)


def transcribe(sources, cls, out_path, header):
    rows = []
    skipped = []
    for src in sources:
        for name, typ, f in parse(src):
            if typ != cls.replace("PBSParameters", "PBSParameters"):
                pass
            if "lwe_dimension" not in f:
                continue
            if f.get("ciphertext_modulus", "native") != "native":
                skipped.append(name)
                continue
            rows.append(emit_row(name, typ, f, cls))
    names = [r.split(" = ")[0] for r in rows]
    with open(out_path, "w") as fh:
        fh.write(header)
        fh.write("\n\n")
        fh.write("\n\n".join(rows))
        fh.write("\n\n\nALL = [\n")
        for n in names:
            fh.write(f"    {n},\n")
        fh.write("]\n")
    return names, skipped


def main():
    wopbs_header = (
        '"""WoPBS parameter catalog, transcribed VERBATIM from the '
        "reference\n(ref: tfhe/src/shortint/parameters/parameters_wopbs.rs,"
        "\nparameters_wopbs_message_carry.rs, parameters_wopbs_prime_moduli"
        ".rs)\nvia tools/transcribe_params.py — numeric constants only, per"
        "\nSURVEY §2 #29 (parameter sets are copied verbatim).\"\"\"\n\n"
        "from .types import EncryptionKeyChoice, WopbsParameters\n")
    wnames, wskip = transcribe(
        [f"{REF}/parameters_wopbs.rs",
         f"{REF}/parameters_wopbs_message_carry.rs",
         f"{REF}/parameters_wopbs_prime_moduli.rs"],
        "WopbsParameters", "tfhe_tpu/params/wopbs_params.py", wopbs_header)

    cpk_header = (
        '"""Compact-public-key parameter catalog, transcribed VERBATIM '
        "from the\nreference (ref: tfhe/src/shortint/parameters/"
        "parameters_compact_pk.rs)\nvia tools/transcribe_params.py — "
        "numeric constants only, per SURVEY §2 #29.\"\"\"\n\n"
        "from .types import ClassicPBSParameters, EncryptionKeyChoice\n")
    cnames, cskip = transcribe(
        [f"{REF}/parameters_compact_pk.rs"],
        "ClassicPBSParameters", "tfhe_tpu/params/compact_pk_params.py",
        cpk_header)

    mb_header = (
        '"""Multi-bit parameter catalog, transcribed VERBATIM from the\n'
        "reference (ref: tfhe/src/shortint/parameters/multi_bit.rs) via\n"
        "tools/transcribe_params.py — numeric constants only, per SURVEY "
        "§2 #29.\"\"\"\n\n"
        "from .types import EncryptionKeyChoice, MultiBitPBSParameters\n")
    mnames, mskip = transcribe(
        [f"{REF}/multi_bit.rs"],
        "MultiBitPBSParameters", "tfhe_tpu/params/multi_bit_params.py",
        mb_header)

    print(f"wopbs: {len(wnames)} rows ({len(wskip)} non-native skipped)")
    print(f"compact_pk: {len(cnames)} rows ({len(cskip)} skipped)")
    print(f"multi_bit: {len(mnames)} rows ({len(mskip)} skipped)")


if __name__ == "__main__":
    sys.exit(main())
