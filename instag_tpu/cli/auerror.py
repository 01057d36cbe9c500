"""CLI: AU intensity error between two OpenFace CSVs (reference auerror.py).

    python -m instag_tpu.cli.auerror --pred pred_au.csv --gt gt_au.csv
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser("auerror")
    parser.add_argument("--pred", required=True)
    parser.add_argument("--gt", required=True)
    args = parser.parse_args(argv)
    from ..metrics import au_error
    print(json.dumps(au_error(args.pred, args.gt)))


if __name__ == "__main__":
    main()
