"""CLI: few-shot mouth adaptation (reference train_mouth.py __main__).
Loads chkpnt_face_latest.pkl from the model dir for the conditioning branch.
"""

from __future__ import annotations

import os

from ..config import make_parser, parse_all
from ..io.checkpoints import (load_bundle, save_bundle, save_gaussian_ply,
                              state_from_dict, state_to_dict)
from ..train.mouth import train_mouth


def main(argv=None):
    parser = make_parser("Few-shot mouth adaptation")
    parser.add_argument("--long", action="store_true")
    parser.add_argument("--pretrain_path", type=str, default="")
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="frames per optimizer step, sharded over a "
                             "'dp' device mesh (see cli/train_face)")
    mc, _, oc, args = parse_all(parser, argv)
    mc.type = "mouth"
    dp_mesh = None
    if args.data_parallel > 1:
        from ..parallel import make_mesh
        dp_mesh = make_mesh(args.data_parallel)

    face = load_bundle(os.path.join(mc.model_path, "chkpnt_face_latest.pkl"))
    face["state"] = state_from_dict(face["state"])

    pretrain = None
    if args.pretrain_path:
        pretrain = load_bundle(args.pretrain_path)
        if "ema_params" in pretrain:
            pretrain = {"umf_params": pretrain["ema_params"]}

    resume = load_bundle(args.start_checkpoint) if args.start_checkpoint \
        else None
    res = train_mouth(mc, oc, face_bundle=face, pretrain_bundle=pretrain,
                      long=args.long, seed=args.seed, resume_bundle=resume,
                      data_parallel=args.data_parallel, dp_mesh=dp_mesh)

    bundle = dict(state=state_to_dict(res["state"]),
                  umf_params=res["umf_params"],
                  pmf_params=res["pmf_params"],
                  gopt=res["gopt"],
                  umf_opt_state=res["umf_opt_state"],
                  pmf_opt_state=res["pmf_opt_state"],
                  iteration=oc.iterations)
    save_bundle(os.path.join(mc.model_path, "chkpnt_mouth_latest.pkl"), bundle)
    save_gaussian_ply(os.path.join(
        mc.model_path, "point_cloud", f"iteration_{oc.iterations}_mouth",
        "point_cloud.ply"), res["state"])
    print(f"train_mouth done: final loss "
          f"{sum(res['losses'][-50:]) / 50:.4f}")


if __name__ == "__main__":
    main()
