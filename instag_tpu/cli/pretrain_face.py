"""CLI: multi-identity face UMF pre-training (reference pretrain_face.py).

    python -m instag_tpu.cli.pretrain_face -s data/pretrain -m output/pre \
        --type face --init_num 2000 --iterations 30000 \
        --data_list id_a,id_b,id_c
"""

from __future__ import annotations

import os

from ..config import make_parser, parse_all, save_cfg
from ..io.checkpoints import save_bundle, state_to_dict
from ..train.pretrain import pretrain_face


def main(argv=None):
    parser = make_parser("Multi-identity face pre-training")
    parser.add_argument("--data_list", type=str, default="",
                        help="comma-separated identity dir names under "
                             "source_path; default: all subdirs")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--share_audio_net", action="store_true",
                        help="tie PMF audio encoders to the UMF's "
                             "(reference pretrain_face.py:79)")
    parser.add_argument("--identity_parallel", action="store_true",
                        help="train all identities simultaneously over an "
                             "'id' device mesh (one device per identity)")
    mc, _, oc, args = parse_all(parser, argv)
    mc.type = "face"

    if args.data_list:
        data_list = args.data_list.split(",")
    else:
        data_list = sorted(
            d for d in os.listdir(mc.source_path)
            if os.path.isdir(os.path.join(mc.source_path, d)))

    res = pretrain_face(mc, oc, data_list, seed=args.seed,
                        share_audio_net=args.share_audio_net,
                        identity_parallel=args.identity_parallel)

    save_cfg(mc.model_path, mc)
    save_bundle(os.path.join(mc.model_path, "chkpnt_face_latest.pkl"),
                dict(umf_params=res["umf_params"],
                     data_list=data_list))
    save_bundle(os.path.join(mc.model_path, "chkpnt_ema_face_latest.pkl"),
                dict(umf_params=res["ema_params"], ema_params=res["ema_params"],
                     data_list=data_list))
    # per-identity clouds for pretrain_mouth (reference :436-443)
    import jax
    for name, st, pmf_idx in zip(data_list, res["states"],
                                 range(len(data_list))):
        pmf = jax.tree.map(lambda x, k=pmf_idx: x[k], res["pmf_stack"])
        save_bundle(os.path.join(mc.model_path, f"{name}_face_latest.pkl"),
                    dict(state=state_to_dict(st), pmf_params=pmf))
    print("pretrain_face done")


if __name__ == "__main__":
    main()
