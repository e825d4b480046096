"""Convert a released reference (PyTorch) checkpoint into this framework's
Orbax format, so training can resume / inference can run without torch at
runtime.

Usage:
  python tools/convert_reference_ckpt.py --config configs/lj/ds_beta6.yaml \
      --ckpt /path/to/model_ckpt_steps_160000.ckpt --out checkpoints/my_exp \
      [--kind diffusion|fs2|pe|hifigan|pwg]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--kind", default="diffusion",
                    choices=["diffusion", "fs2", "pe", "hifigan", "pwg"])
    args = ap.parse_args()

    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.convert import checkpoint as C

    hp = load_config(args.config)
    sd = C.load_torch_state_dict(C.find_latest_ckpt(args.ckpt) or args.ckpt)
    if args.kind == "diffusion":
        params = C.convert_diffusion_ckpt(sd)
    elif args.kind == "fs2":
        params = {"fs2": C.convert_fs2(sd)}
    elif args.kind == "pe":
        params = C.convert_pe(sd)
    elif args.kind == "hifigan":
        params = C.convert_hifigan(sd)
    else:
        params = C.convert_pwg(sd)

    import orbax.checkpoint as ocp

    out = os.path.abspath(os.path.join(args.out, "converted_params"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(out, params)
    n = sum(np.prod(x.shape) for x in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"| converted {args.kind} checkpoint ({int(n):,} params) -> {out}")


if __name__ == "__main__":
    main()
