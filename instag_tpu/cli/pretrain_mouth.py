"""CLI: multi-identity mouth UMF pre-training (reference pretrain_mouth.py).
Requires pretrain_face outputs in the same model dir.
"""

from __future__ import annotations

import os

from ..config import make_parser, parse_all
from ..io.checkpoints import (bundle_list, load_bundle, save_bundle,
                              state_from_dict)
from ..train.pretrain import pretrain_mouth


def main(argv=None):
    parser = make_parser("Multi-identity mouth pre-training")
    parser.add_argument("--data_list", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--identity_parallel", action="store_true")
    mc, _, oc, args = parse_all(parser, argv)
    mc.type = "mouth"

    face_ema = load_bundle(os.path.join(mc.model_path,
                                        "chkpnt_ema_face_latest.pkl"))
    data_list = (args.data_list.split(",") if args.data_list
                 else bundle_list(face_ema["data_list"]))
    face_states = []
    for name in data_list:
        b = load_bundle(os.path.join(mc.model_path, f"{name}_face_latest.pkl"))
        face_states.append(state_from_dict(b["state"]))
    face_result = dict(states=face_states,
                       ema_params=face_ema["umf_params"])

    res = pretrain_mouth(mc, oc, data_list, face_result, seed=args.seed,
                         identity_parallel=args.identity_parallel)

    save_bundle(os.path.join(mc.model_path, "chkpnt_mouth_latest.pkl"),
                dict(umf_params=res["umf_params"], data_list=data_list))
    save_bundle(os.path.join(mc.model_path, "chkpnt_ema_mouth_latest.pkl"),
                dict(umf_params=res["ema_params"],
                     ema_params=res["ema_params"], data_list=data_list))
    print("pretrain_mouth done")


if __name__ == "__main__":
    main()
