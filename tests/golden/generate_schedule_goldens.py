"""Golden LR sequences from the reference CosineAnnealingScheduler
(ref cosine_annealing.py), executed against a stub Keras optimizer.

Run: python tests/golden/generate_schedule_goldens.py
"""

import json
import pathlib
import sys
import types

sys.path.insert(0, "/root/reference/yolo_v1")

import tensorflow as tf  # noqa: E402
from tensorflow.keras import backend as K  # noqa: E402

from cosine_annealing import CosineAnnealingScheduler  # noqa: E402

OUT = pathlib.Path(__file__).parent / "schedule_goldens.json"


def run_reference(num_epochs, eta_max, eta_min, t_max, t_mult, decay):
    cb = CosineAnnealingScheduler(eta_max, eta_min=eta_min, T_max=t_max,
                                  T_mult=t_mult, decay=decay)
    lr_var = tf.Variable(0.0)
    # keras Callback.model is a read-only property backed by _model
    cb._model = types.SimpleNamespace(optimizer=types.SimpleNamespace(lr=lr_var))
    lrs = []
    for epoch in range(num_epochs):
        cb.on_epoch_begin(epoch)
        lrs.append(float(K.get_value(lr_var)))
    return lrs


def main():
    cases = []
    for params in [
        dict(num_epochs=80, eta_max=0.001, eta_min=0.0, t_max=10, t_mult=2, decay=1.0),
        dict(num_epochs=120, eta_max=0.01, eta_min=1e-5, t_max=5, t_mult=3, decay=0.8),
        dict(num_epochs=50, eta_max=0.001, eta_min=0.0, t_max=7, t_mult=1, decay=0.9),
    ]:
        cases.append({"params": params, "lrs": run_reference(**params)})
    with open(OUT, "w") as f:
        json.dump(cases, f)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
