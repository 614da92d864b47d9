"""train_label_snapshot export.

Capability parity with the reference's end-of-training export
(`main_deep_staple.py:963-1045`): for every *training* instance store its DP
value, disturb flag, id, dataset idx, paths, clean label, modified label, and
a fresh network prediction — rows sorted ascending by DP value, label volumes
sparse. Labels/predictions are stored at the x2.0 eval scale (the reference's
eval-mode `__getitem__` interpolation, `HybridIdLoader.py:336`), which the
consensus stage depends on.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.snapshot_io import save_snapshot
from ..ops.resample import interpolate_sample
from .state import DeepStapleState


def export_train_label_snapshot(
    path,
    state: DeepStapleState,
    model,
    config,
    dataset,
    train_idxs,
    disturbed_bool_vect,
    save_labels: bool = True,
    eval_scale_factor: float = 2.0,
):
    use_2d = dataset.use_2d()

    # Multi-host safe: the export runs on process 0 only (no collectives), so
    # mesh-global state must be localized first — a jit closing over arrays
    # that span non-addressable devices cannot compile. Fully-replicated
    # arrays convert via np.asarray on every host; this is a no-op copy
    # single-process (1.2M params).
    params_local = jax.tree.map(np.asarray, state.params)
    stats_local = jax.tree.map(np.asarray, state.batch_stats)

    @jax.jit
    def _predict(img):
        img2, _ = interpolate_sample(img, None, eval_scale_factor, use_2d)
        out = model.apply(
            {"params": params_local, "batch_stats": stats_local}, img2[..., None], train=False
        )["out"]
        return jnp.argmax(out, axis=-1)

    @jax.jit
    def _scale_label(lbl):
        return interpolate_sample(None, lbl, eval_scale_factor, use_2d)[1]

    dataset.eval(use_modified=True)
    dp_weights = np.asarray(state.dp_params)

    rows = []
    for i in train_idxs:
        s = dataset[int(i)]
        img = jnp.asarray(s["image"][None].astype(np.float32))
        pred = np.asarray(_predict(img))[0]
        lbl = np.asarray(_scale_label(jnp.asarray(s["label"][None].astype(np.int32))))[0]
        mod = np.asarray(_scale_label(jnp.asarray(s["modified_label"][None].astype(np.int32))))[0]
        rows.append(
            (
                float(dp_weights[int(i)]),
                bool(disturbed_bool_vect[int(i)]),
                s["id"],
                int(i),
                str(s["image_path"]),
                lbl,
                str(s["label_path"]),
                mod,
                pred,
            )
        )

    rows.sort(key=lambda r: r[0])  # ascending by DP value (reference :997)
    (
        dp_weight, disturb_flags, d_ids, dataset_idxs, image_paths,
        labels, label_paths, modified_labels, predictions,
    ) = zip(*rows)

    snapshot = {
        "data_parameters": np.asarray(dp_weight, np.float32),
        "disturb_flags": np.asarray(disturb_flags, np.bool_),
        "d_ids": list(d_ids),
        "dataset_idxs": np.asarray(dataset_idxs, np.int32),
        "image_paths": list(image_paths),
        "label_paths": list(label_paths),
    }
    if save_labels:
        snapshot.update(
            labels=np.stack(labels),
            modified_labels=np.stack(modified_labels),
            train_predictions=np.stack(predictions),
        )
    save_snapshot(Path(path), snapshot)
    return snapshot
