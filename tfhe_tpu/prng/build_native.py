"""Build the native AES-CTR CSPRNG shared library.

Usage: python -m tfhe_tpu.prng.build_native
"""

import os
import subprocess
import sys


def build(verbose: bool = True) -> str | None:
    here = os.path.join(os.path.dirname(__file__), "csrc")
    src = os.path.join(here, "aes_csprng.cpp")
    out = os.path.join(here, "libaes_csprng.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return None
    return out


if __name__ == "__main__":
    path = build()
    if path:
        print(f"built {path}")
    else:
        sys.exit(1)
