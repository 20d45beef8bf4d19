"""Import modules from the read-only reference checkout (/root/reference).

The parity suite in test_reference_parity.py needs the reference's OWN
torch code (model/tsrn.py, model/crnn/crnn.py, loss/*, utils/ssim_psnr.py)
rather than locally-written golden mirrors, so that any semantic drift the
mirrors share with the rebuild is caught.

The reference modules import a few packages that are not in this
environment (IPython, torchvision); they are used only in dead paths
(``embed()`` calls, ``__main__`` demo blocks), so minimal stub modules are
installed in sys.modules before import.  Nothing from the reference tree is
copied — the modules are imported in place at test time.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "model"))


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        # never clobber an attribute something else already provided — e.g.
        # the functional lmdb shim test_reference_whole_run installs (backed
        # by tpgsr_tpu.data.lmdb.LMDBReader) must keep its real ``open``
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


class _ToTensor:
    """Functional torchvision.transforms.ToTensor equivalent (the reference's
    resizeNormalize calls it on uint8 PIL images): HWC uint8 -> CHW float/255."""

    def __call__(self, pic):
        import numpy as np
        import torch

        arr = np.array(pic, np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy()).float().div(255.0)


def _install_stubs() -> None:
    # IPython.embed appears at module level in most reference files but is
    # only ever called from debug paths.
    # get_ipython: torch's lazy REPL-displayhook probe calls
    # sys.modules['IPython'].get_ipython() if the module is present
    _stub("IPython", embed=lambda *a, **k: None, get_ipython=lambda: None)
    # torchvision: `from torchvision import transforms` at module level; the
    # dataset collates DO call transforms.ToTensor(), so it is functional.
    tv = _stub("torchvision")
    transforms = _stub("torchvision.transforms", ToTensor=_ToTensor)
    tv.transforms = transforms
    utils_mod = _stub("torchvision.utils", make_grid=lambda *a, **k: None)
    tv.utils = utils_mod
    # model/srcnn.py imports torchvision.datasets and matplotlib.pyplot at
    # module level; both are only used in dead demo paths.
    tv.datasets = _stub("torchvision.datasets", ImageFolder=None)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        mpl = _stub("matplotlib")
        mpl.pyplot = _stub("matplotlib.pyplot", figure=None, imshow=None, show=None)
    # dataset/dataset.py module-level imports; the exercised collate paths
    # never call into these.
    _stub("cv2", cvtColor=None, COLOR_GRAY2RGB=None)
    _stub("lmdb", open=lambda *a, **k: None)
    _stub("pyfasttext", FastText=object)
    models = _stub("torchvision.models")
    vgg = _stub("torchvision.models.vgg", vgg16=None)
    models.vgg = vgg
    tv.models = models
    # utils/metrics.py and model/SEED/evaluation_metrics/metrics.py import
    # editdistance at module level; give the stub a REAL Levenshtein (ours)
    # so the reference's EditDistance helpers compute true values.
    from tpgsr_tpu.utils.metrics import levenshtein as _lev

    _stub("editdistance", eval=lambda a, b: _lev(str(a), str(b)))
    # model/SEED/utils/visualization_utils.py does `from scipy.misc import
    # imresize`, removed from scipy years ago; give the real module a dummy.
    # utils/metrics.py uses the np.int alias removed in numpy 1.24
    import numpy as _np2

    for _name, _alias in (("int", int), ("float", float), ("bool", bool)):
        if not hasattr(_np2, _name):
            setattr(_np2, _name, _alias)
    # utils/utils_moran.py uses the pre-3.10 collections.Iterable alias
    import collections as _collections
    import collections.abc as _cabc

    if not hasattr(_collections, "Iterable"):
        _collections.Iterable = _cabc.Iterable
    # utils/utils_deblur.py uses ancient scipy aliases removed years ago
    # (scipy.finfo); restore them as the numpy equivalents.
    try:
        import numpy as _np
        import scipy as _scipy

        for _name in ("finfo", "zeros", "ones"):
            if not hasattr(_scipy, _name):
                setattr(_scipy, _name, getattr(_np, _name))
    except ImportError:
        pass
    try:
        import scipy.misc as _scipy_misc

        if not hasattr(_scipy_misc, "imresize"):
            _scipy_misc.imresize = lambda *a, **k: None
    except ImportError:
        _stub("scipy"); _stub("scipy.misc", imresize=lambda *a, **k: None)


def load_reference_module(name: str):
    """Import ``name`` (e.g. 'model.tsrn') from the reference checkout."""
    if not reference_available():
        raise RuntimeError(f"reference checkout not found at {REFERENCE_ROOT}")
    _install_stubs()
    # Appended (not prepended) so the reference's generic top-level package
    # names (model, loss, utils, dataset) can never shadow installed ones.
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    return importlib.import_module(name)
