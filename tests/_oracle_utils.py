"""Shared helpers for reference-oracle tests: stub genuinely-missing modules
with proper ModuleSpecs so importlib and other tests stay functional."""

import importlib.machinery
import importlib.util
import sys
import types


def _missing(name: str) -> bool:
    if name in sys.modules:
        return False
    try:
        return importlib.util.find_spec(name) is None
    except (ValueError, ModuleNotFoundError):
        return False


def _make_stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def stub_missing_modules():
    """Stub the reference loss modules' heavyweight imports that aren't in
    this environment (ffmpeg-python, moviepy, torchvision). Installed modules
    are never shadowed."""
    for name in ("ffmpeg", "cv2", "lmdb", "spacy"):
        if _missing(name):
            sys.modules[name] = _make_stub(name)
    if _missing("moviepy"):
        mp = _make_stub("moviepy")
        ed = _make_stub("moviepy.editor")
        ed.VideoFileClip = object
        mp.editor = ed
        sys.modules["moviepy"] = mp
        sys.modules["moviepy.editor"] = ed
    if _missing("torchvision"):
        tv = _make_stub("torchvision")
        tr = _make_stub("torchvision.transforms")
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
