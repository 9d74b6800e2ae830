#!/usr/bin/env python
"""PA-ATF training entry point (reference ``methods/PA_ATF/PA_ATF_train.py``):
ATF tri-way + partial-alignment masks + CLUB mutual-information heads."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_train_parser  # noqa: E402
from da_runner import run_da_training  # noqa: E402
from tllod_tpu.methods.pa_atf import PAATFModel, pa_atf_loss  # noqa: E402

def main():
    parser = build_train_parser("Train a PA-ATF network (TPU)")
    parser.add_argument("--beta", default=0.1, type=float,
                        help="pm (CLUB) loss weight")
    parser.add_argument("--source_intra", action="store_true",
                        help="vgg16_source_intra variant: CLUB pools gt-RoI "
                             "features from the main branch")
    parser.add_argument("--use_ins", dest="ins", action="store_true",
                        help="parsed but never consumed upstream "
                             "(PA_ATF_train.py:135-137); accepted for "
                             "drop-in script compatibility, ignored")
    args = parser.parse_args()
    run_da_training(
        "pa_atf", PAATFModel,
        lambda a: (lambda out: pa_atf_loss(out, a.lamda, a.beta)), args,
        extra_model_kwargs={"club_branch": ("main" if args.source_intra
                                            else "ancillary")},
        extra_backbone_subtrees=(("backbone_anc",),))

if __name__ == "__main__":
    main()
