"""CLI: joint fusion fine-tune (reference train_fuse_con.py __main__).
Consumes chkpnt_face_latest.pkl + chkpnt_mouth_latest.pkl; writes
chkpnt_fuse_latest.pkl.
"""

from __future__ import annotations

import os

from ..config import make_parser, parse_all
from ..io.checkpoints import (load_bundle, save_bundle, state_from_dict,
                              state_to_dict)
from ..train.fuse import train_fuse


def main(argv=None):
    parser = make_parser("Fusion fine-tune")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="frames per optimizer step, sharded over a "
                             "'dp' device mesh (see cli/train_face)")
    mc, _, oc, args = parse_all(parser, argv)
    dp_mesh = None
    if args.data_parallel > 1:
        from ..parallel import make_mesh
        dp_mesh = make_mesh(args.data_parallel)

    face = load_bundle(os.path.join(mc.model_path, "chkpnt_face_latest.pkl"))
    face["state"] = state_from_dict(face["state"])
    mouth = load_bundle(os.path.join(mc.model_path, "chkpnt_mouth_latest.pkl"))
    mouth["state"] = state_from_dict(mouth["state"])

    res = train_fuse(mc, oc, face, mouth, seed=args.seed,
                     data_parallel=args.data_parallel, dp_mesh=dp_mesh)

    bundle = dict(
        face_state=state_to_dict(res["face_state"]),
        mouth_state=state_to_dict(res["mouth_state"]),
        face_umf_params=res["face_umf_params"],
        mouth_umf_params=res["mouth_umf_params"],
        face_pmf_params=res["face_pmf_params"],
        mouth_pmf_params=res["mouth_pmf_params"],
        iteration=oc.iterations)
    save_bundle(os.path.join(mc.model_path, "chkpnt_fuse_latest.pkl"), bundle)
    print(f"train_fuse done: final loss "
          f"{sum(res['losses'][-50:]) / 50:.4f}")


if __name__ == "__main__":
    main()
