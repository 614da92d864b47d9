"""torchvision import stub for reference oracle runs.

The reference imports torchvision at module scope (`main_deep_staple.py:43`,
`visualization.py:11,13`) but its 3D path never *calls* it: the 2D model
factory (`main_deep_staple.py:388`) and the viz grid helpers (`visualization.py
:157,221`) are unreachable with `use_2d_normal_to=None`, `do_plot=False` and
the hard-coded `skip_writeout=True` (:1057). Every entry point raises if hit.
"""

import sys
import types


def _unavailable(name):
    def _raise(*args, **kwargs):
        raise RuntimeError(
            f"torchvision shim: {name} is not available in oracle runs "
            "(only the reference's 3D path is supported)"
        )
    return _raise


models = types.ModuleType("torchvision.models")
models.segmentation = types.ModuleType("torchvision.models.segmentation")
models.segmentation.lraspp_mobilenet_v3_large = _unavailable(
    "models.segmentation.lraspp_mobilenet_v3_large")

transforms = types.ModuleType("torchvision.transforms")
transforms.functional = types.ModuleType("torchvision.transforms.functional")
transforms.functional.to_tensor = _unavailable("transforms.functional.to_tensor")
transforms.functional.to_pil_image = _unavailable("transforms.functional.to_pil_image")

utils = types.ModuleType("torchvision.utils")
utils.make_grid = _unavailable("utils.make_grid")

for _name, _mod in (
    ("torchvision.models", models),
    ("torchvision.models.segmentation", models.segmentation),
    ("torchvision.transforms", transforms),
    ("torchvision.transforms.functional", transforms.functional),
    ("torchvision.utils", utils),
):
    sys.modules[_name] = _mod
