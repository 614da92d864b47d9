from .voting import calc_dp_consensus
from .staple import staple_consensus, StapleResult
from .evaluate import build_consensus_dicts, evaluate_consensus, extract_consensus_dices
from .figures import save_consensus_boxplot, save_atlas_weighting_figure

__all__ = [
    "calc_dp_consensus",
    "staple_consensus",
    "StapleResult",
    "build_consensus_dicts",
    "evaluate_consensus",
    "extract_consensus_dices",
    "save_consensus_boxplot",
    "save_atlas_weighting_figure",
]
