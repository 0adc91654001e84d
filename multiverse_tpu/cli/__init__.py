"""CLI drivers mirroring the reference entry points.

reference CLIs → rebuilt modules:
    code/preprocess.py              → multiverse_tpu.cli.preprocess
    code/train.py                   → multiverse_tpu.cli.train
    code/test.py                    → multiverse_tpu.cli.test
    code/multifuture_inference.py   → multiverse_tpu.cli.multifuture_inference
    code/multifuture_eval_trajs.py  → multiverse_tpu.cli.multifuture_eval_trajs
    code/multifuture_eval_trajs_prob.py
                                    → multiverse_tpu.cli.multifuture_eval_trajs_prob
    SimAug/code/evaluate_sdd.py     → multiverse_tpu.cli.evaluate_sdd

Flag names follow the reference docs (TRAINING.md / TESTING.md) so the
published commands translate one-to-one.
"""
