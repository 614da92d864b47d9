from .voting import calc_dp_consensus
from .staple import staple_consensus, StapleResult
from .evaluate import build_consensus_dicts, evaluate_consensus, extract_consensus_dices
from .interop import load_consensus_dicts_pth, save_consensus_dicts_pth

_FIGURE_EXPORTS = ("save_consensus_boxplot", "save_atlas_weighting_figure")


def __getattr__(name):
    # Lazy: figures.py needs matplotlib (the optional viz extra); importing
    # the consensus package for voting/STAPLE must not require it.
    if name in _FIGURE_EXPORTS:
        from . import figures

        return getattr(figures, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "calc_dp_consensus",
    "staple_consensus",
    "StapleResult",
    "build_consensus_dicts",
    "evaluate_consensus",
    "extract_consensus_dices",
    "load_consensus_dicts_pth",
    "save_consensus_dicts_pth",
    "save_consensus_boxplot",
    "save_atlas_weighting_figure",
]
