"""Subprocess experiment entry point.

Capability parity with the reference's run_entrypoint.py
(UNI/utils/run_entrypoint.py:1-11): the reference serializes an arbitrary
thunk through cloudpickle/zlib/base64 and re-executes it in a child
process.  In a config-first design the payload is simply the pickled
``(NLBACConfig, train kwargs)``, zlib-compressed and base64-encoded —
enough for cluster wrappers that must launch one variant per process:

    payload = encode_experiment(cfg, output_dir="runs/x")
    subprocess.run([sys.executable, "-m",
                    "nlbac_tpu.utils.run_entrypoint", payload])
"""

from __future__ import annotations

import base64
import pickle
import sys
import zlib


def encode_experiment(cfg, **train_kwargs) -> str:
    blob = pickle.dumps((cfg, train_kwargs),
                        protocol=pickle.HIGHEST_PROTOCOL)
    return base64.b64encode(zlib.compress(blob)).decode("ascii")


def decode_experiment(payload: str):
    cfg, train_kwargs = pickle.loads(
        zlib.decompress(base64.b64decode(payload.encode("ascii"))))
    return cfg, train_kwargs


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        raise SystemExit("usage: python -m nlbac_tpu.utils.run_entrypoint "
                         "<base64 payload>")
    cfg, train_kwargs = decode_experiment(argv[0])
    from nlbac_tpu.train.cli import enable_compilation_cache, train
    enable_compilation_cache()
    train(cfg, **train_kwargs)


if __name__ == "__main__":
    main()
