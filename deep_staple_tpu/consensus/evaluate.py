"""Consensus stage driver.

Capability parity with `consensus.ipynb` cells 5-7: regroup a
train_label_snapshot by fixed image (`f_id = _id[:4]`, `m_id = _id[6:]`,
cell 6:32-51), compute the DP weighted-voting consensus and the STAPLE
consensus per fixed image, score both against the expert label with dice3d,
and persist per-case consensus dicts.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..data.snapshot_io import load_snapshot
from ..ops.dice import dice3d
from .staple import staple_consensus
from .voting import calc_dp_consensus


def build_consensus_dicts(snapshot: dict) -> dict:
    """Regroup snapshot rows into {f_id: {'expert_label', 'prediction',
    m_id: {'warped_label', 'data_parameter'}}} (cell 6:32-51)."""
    d_ids = list(snapshot["d_ids"])
    consensus_dicts: dict = {}
    for i, _id in enumerate(d_ids):
        f_id, m_id = _id[:4], _id[6:]
        fixed = consensus_dicts.get(f_id)
        if fixed is None:
            fixed = {
                "expert_label": np.asarray(snapshot["labels"][i]),
                "prediction": np.asarray(snapshot["train_predictions"][i]),
            }
            # Real reference artifacts carry an image_path per fixed image —
            # their nnU-Net prep REQUIRES the key to exist
            # (nnunet_prepare_dataparameter_consensus_data.py:39 removes it).
            paths = snapshot.get("image_paths")
            if paths is not None and i < len(paths):
                fixed["image_path"] = str(paths[i])
        moving = fixed.get(m_id, {})
        moving["warped_label"] = np.asarray(snapshot["modified_labels"][i])
        moving["data_parameter"] = float(np.asarray(snapshot["data_parameters"][i]).reshape(()))
        fixed[m_id] = moving
        consensus_dicts[f_id] = fixed
    return consensus_dicts


def evaluate_consensus(
    snapshot_path,
    out_path=None,
    staple_max_iterations: int = 200,
    use_native_staple: bool = False,
    batch_cases: bool = True,
) -> dict:
    """Compute DP + STAPLE consensi and oracle dices for every fixed image.

    With ``batch_cases`` (default), cases with equal atlas counts are stacked
    and processed by ONE vmapped computation (DP voting + STAPLE EM + dice) —
    the TPU-native replacement for the reference notebook's per-case loop
    (cell 6:53-98)."""
    snapshot = load_snapshot(snapshot_path) if not isinstance(snapshot_path, dict) else snapshot_path
    consensus_dicts = build_consensus_dicts(snapshot)

    if batch_cases and not use_native_staple:
        return _evaluate_batched(consensus_dicts, staple_max_iterations, out_path)

    for f_id, fixed in consensus_dicts.items():
        moving_ids = [k for k, v in fixed.items() if isinstance(v, dict)]
        lbls = [fixed[m]["warped_label"] for m in moving_ids]
        dps = [fixed[m]["data_parameter"] for m in moving_ids]
        expert = fixed["expert_label"]

        dp_consensus = np.asarray(calc_dp_consensus(jnp.stack([jnp.asarray(l) for l in lbls]), jnp.asarray(dps)))

        if use_native_staple:
            from .native_staple import staple_consensus_native

            staple_out, sens, spec, _ = staple_consensus_native(lbls, staple_max_iterations)
        else:
            res = staple_consensus(lbls, max_iterations=staple_max_iterations)
            staple_out = np.asarray(res.consensus)
            sens, spec = np.asarray(res.sensitivities), np.asarray(res.specificities)

        # Reference keeps sensitivity AND specificity per atlas (cell 5:24-26).
        for m_id, s, p in zip(moving_ids, sens, spec):
            fixed[m_id]["staple_sensitivity"] = float(s)
            fixed[m_id]["staple_specificity"] = float(p)

        dp_dsc = np.asarray(
            dice3d(
                jnp.asarray(np.eye(2, dtype=np.int32)[dp_consensus][None]),
                jnp.asarray(np.eye(2, dtype=np.int32)[expert][None]),
                one_hot_torch_style=True,
                nan_for_unlabeled_target=False,
            )
        )
        staple_dsc = np.asarray(
            dice3d(
                jnp.asarray(np.eye(2, dtype=np.int32)[staple_out][None]),
                jnp.asarray(np.eye(2, dtype=np.int32)[expert][None]),
                one_hot_torch_style=True,
                nan_for_unlabeled_target=False,
            )
        )
        fixed["dp_consensus"] = dp_consensus
        fixed["staple_consensus"] = staple_out
        fixed["dp_consensus_oracle_dice"] = dp_dsc
        fixed["staple_consensus_oracle_dice"] = staple_dsc

    _save_consensus_dicts(consensus_dicts, out_path)
    return consensus_dicts


def _save_consensus_dicts(consensus_dicts: dict, out_path) -> None:
    """Persist: ``.pth`` → the reference torch schema (interop.py), readable
    by the reference's cell-7 extractor and nnU-Net prep; anything else →
    native pickle."""
    if out_path is None:
        return
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if out_path.suffix == ".pth":
        from .interop import save_consensus_dicts_pth

        save_consensus_dicts_pth(out_path, consensus_dicts)
        return
    with open(out_path, "wb") as f:
        pickle.dump(consensus_dicts, f)


def _evaluate_batched(consensus_dicts: dict, staple_max_iterations: int, out_path):
    from ..ops.dice import dice_from_int_labels
    from .staple import staple_consensus_batch
    from .voting import calc_dp_consensus_batch

    # group cases by (atlas count, spatial shape) so stacks are rectangular
    groups: dict = {}
    for f_id, fixed in consensus_dicts.items():
        moving_ids = [k for k, v in fixed.items() if isinstance(v, dict)]
        key = (len(moving_ids), np.asarray(fixed["expert_label"]).shape)
        groups.setdefault(key, []).append((f_id, moving_ids))

    for (n_atlas, spatial), members in groups.items():
        lbls = jnp.stack(
            [
                jnp.stack([jnp.asarray(consensus_dicts[f][m]["warped_label"]) for m in mids])
                for f, mids in members
            ]
        )  # (C, R, *spatial)
        dps = jnp.asarray(
            [[consensus_dicts[f][m]["data_parameter"] for m in mids] for f, mids in members],
            jnp.float32,
        )
        experts = jnp.stack(
            [jnp.asarray(consensus_dicts[f]["expert_label"]) for f, _ in members]
        ).astype(jnp.int32)

        dp_cons = calc_dp_consensus_batch(lbls.astype(jnp.float32), dps)
        st = staple_consensus_batch(lbls, max_iterations=staple_max_iterations)
        dp_dice = dice_from_int_labels(dp_cons, experts, 2, nan_for_unlabeled_target=False)
        st_dice = dice_from_int_labels(st.consensus, experts, 2, nan_for_unlabeled_target=False)

        for ci, (f_id, mids) in enumerate(members):
            fixed = consensus_dicts[f_id]
            for mi, m_id in enumerate(mids):
                fixed[m_id]["staple_sensitivity"] = float(st.sensitivities[ci, mi])
                fixed[m_id]["staple_specificity"] = float(st.specificities[ci, mi])
            fixed["dp_consensus"] = np.asarray(dp_cons[ci])
            fixed["staple_consensus"] = np.asarray(st.consensus[ci])
            fixed["dp_consensus_oracle_dice"] = np.asarray(dp_dice[ci])[None]
            fixed["staple_consensus_oracle_dice"] = np.asarray(st_dice[ci])[None]

    _save_consensus_dicts(consensus_dicts, out_path)
    return consensus_dicts


def extract_consensus_dices(consensus_dicts_or_path):
    """Mean oracle dices (cell 7). Accepts the native dict/pickle or a
    reference-schema ``.pth`` (cell 6:96-98 torch format)."""
    if not isinstance(consensus_dicts_or_path, dict):
        if Path(consensus_dicts_or_path).suffix == ".pth":
            from .interop import load_consensus_dicts_pth

            consensus_dicts_or_path = load_consensus_dicts_pth(consensus_dicts_or_path)
        else:
            with open(consensus_dicts_or_path, "rb") as f:
                consensus_dicts_or_path = pickle.load(f)
    dp, st = [], []
    for fixed in consensus_dicts_or_path.values():
        dp.append(fixed["dp_consensus_oracle_dice"])
        st.append(fixed["staple_consensus_oracle_dice"])
    dp_t = np.concatenate(dp)[:, 1]
    st_t = np.concatenate(st)[:, 1]
    print(f"DP consensus mean dice: {dp_t.mean():.3f}")
    print(f"STAPLE consensus mean dice: {st_t.mean():.3f}")
    return dp_t, st_t
