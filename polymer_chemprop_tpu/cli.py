"""Console entry points (reference setup.py:37-48 console_scripts).

Usage:
    python -m polymer_chemprop_tpu.cli train --data_path ... [flags]
    python -m polymer_chemprop_tpu.cli predict --test_path ... --preds_path ...
    python -m polymer_chemprop_tpu.cli fingerprint --test_path ... --checkpoint_dir ...
    python -m polymer_chemprop_tpu.cli hyperopt --data_path ... [flags]

Or via the installed scripts chemprop_train / chemprop_predict /
chemprop_fingerprint / chemprop_hyperopt (setup.py).
"""

from __future__ import annotations

import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        sys.exit(1)
    cmd, rest = argv[0], argv[1:]
    if cmd == "train":
        from .train.cross_validate import chemprop_train
        chemprop_train(rest)
    elif cmd == "predict":
        from .train.make_predictions import chemprop_predict
        chemprop_predict(rest)
    elif cmd == "fingerprint":
        from .train.molecule_fingerprint import chemprop_fingerprint
        chemprop_fingerprint(rest)
    elif cmd == "hyperopt":
        from .hyperparameter_optimization import chemprop_hyperopt
        chemprop_hyperopt(rest)
    elif cmd == "interpret":
        from .interpret import chemprop_interpret
        chemprop_interpret(rest)
    elif cmd == "ssl_pretrain":
        from .ssl import ssl_pretrain_cli
        ssl_pretrain_cli(rest)
    elif cmd == "web":
        import sys as _sys
        _sys.argv = ["chemprop_web"] + rest
        from .web.app import chemprop_web
        chemprop_web()
    elif cmd == "sklearn_train":
        from .sklearn_train import sklearn_train
        sklearn_train(rest)
    elif cmd == "sklearn_predict":
        from .sklearn_predict import sklearn_predict
        sklearn_predict(rest)
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        sys.exit(1)


def chemprop_train() -> None:
    from .train.cross_validate import chemprop_train as run
    run(sys.argv[1:])


def chemprop_predict() -> None:
    from .train.make_predictions import chemprop_predict as run
    run(sys.argv[1:])


def chemprop_fingerprint() -> None:
    from .train.molecule_fingerprint import chemprop_fingerprint as run
    run(sys.argv[1:])


def chemprop_hyperopt() -> None:
    from .hyperparameter_optimization import chemprop_hyperopt as run
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
