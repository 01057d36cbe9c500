"""CLI: few-shot face adaptation (reference train_face.py __main__).

    python -m instag_tpu.cli.train_face -s data/<id> -m output/<run> \
        --iterations 10000 --N_views 250 --init_num 1000 \
        [--long] [--pretrain_path output/pretrain/chkpnt_ema_face_latest.pkl]
"""

from __future__ import annotations

import os

from ..config import make_parser, parse_all, save_cfg
from ..io.checkpoints import (load_bundle, save_bundle, save_gaussian_ply,
                              state_to_dict)
from ..train.face import train_face


def main(argv=None):
    parser = make_parser("Few-shot face adaptation")
    parser.add_argument("--long", action="store_true")
    parser.add_argument("--pretrain_path", type=str, default="")
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--test_every", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="frames per optimizer step; >1 shards the "
                             "frame batch over a 'dp' device mesh (full "
                             "loss incl. densification stats)")
    mc, _, oc, args = parse_all(parser, argv)
    mc.type = "face"

    dp_mesh = None
    if args.data_parallel > 1:
        from ..parallel import make_mesh
        dp_mesh = make_mesh(args.data_parallel)

    pretrain = None
    if args.pretrain_path:
        pretrain = load_bundle(args.pretrain_path)
        if "ema_params" in pretrain:  # pretrain bundle: prefer EMA weights
            pretrain = {"umf_params": pretrain["ema_params"]}
    resume = load_bundle(args.start_checkpoint) if args.start_checkpoint \
        else None

    res = train_face(mc, oc, pretrain_bundle=pretrain, long=args.long,
                     seed=args.seed, resume_bundle=resume,
                     log_dir=mc.model_path or None,
                     test_every=args.test_every,
                     data_parallel=args.data_parallel, dp_mesh=dp_mesh)

    if mc.model_path:
        save_cfg(mc.model_path, mc)
        bundle = dict(state=state_to_dict(res["state"]),
                      umf_params=res["umf_params"],
                      pmf_params=res["pmf_params"],
                      gopt=res["gopt"],
                      umf_opt_state=res["umf_opt_state"],
                      pmf_opt_state=res["pmf_opt_state"],
                      iteration=oc.iterations,
                      max_sh_degree=res["max_sh_degree"])
        save_bundle(os.path.join(mc.model_path, "chkpnt_face_latest.pkl"),
                    bundle)
        save_gaussian_ply(os.path.join(
            mc.model_path, "point_cloud", f"iteration_{oc.iterations}_face",
            "point_cloud.ply"), res["state"])
    print(f"train_face done: final loss "
          f"{sum(res['losses'][-50:]) / 50:.4f}")


if __name__ == "__main__":
    main()
