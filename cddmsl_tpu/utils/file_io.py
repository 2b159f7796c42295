"""Path manager (reference detectron2/utils/file_io.py).

The reference builds on iopath's PathManager with an HTTP handler and a
``detectron2://`` namespace handler that resolves to the public release
bucket. This environment has no egress and iopath is not installed, so
this is a self-contained equivalent: a handler registry over local paths,
with a ``cddmsl://`` (and compat ``detectron2://``) namespace that resolves
into the repo's local checkpoint/config tree (see model_zoo.py). HTTP(S)
URLs resolve only if already cached under ``CDDMSL_CACHE`` — never fetched.
"""

import glob as _glob
import logging
import os
import shutil

__all__ = ["PathManager", "PathHandler"]

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PathHandler:
    """Base handler: subclasses declare prefixes and local-path resolution
    (the iopath PathHandler surface the reference relies on)."""

    def _get_supported_prefixes(self):
        return []

    def _get_local_path(self, path, **kwargs):
        raise NotImplementedError

    def _open(self, path, mode="r", **kwargs):
        return open(self._get_local_path(path), mode, **kwargs)


class _NativePathHandler(PathHandler):
    def _get_local_path(self, path, **kwargs):
        return path

    def _open(self, path, mode="r", **kwargs):
        return open(path, mode, **kwargs)


class HTTPURLHandler(PathHandler):
    """No-egress stand-in for iopath's HTTPURLHandler: resolves a URL to a
    pre-populated local cache entry (CDDMSL_CACHE/<basename>), erroring
    with a clear message instead of downloading."""

    def _get_supported_prefixes(self):
        return ["http://", "https://"]

    def _get_local_path(self, path, **kwargs):
        cache_dir = os.environ.get(
            "CDDMSL_CACHE", os.path.expanduser("~/.cache/cddmsl")
        )
        local = os.path.join(cache_dir, os.path.basename(path.split("?")[0]))
        if not os.path.exists(local):
            raise FileNotFoundError(
                f"{path}: downloads are disabled in this environment; place the "
                f"file at {local} to use it"
            )
        return local


class CDDMSLHandler(PathHandler):
    """Resolve the project namespace onto the local repo tree — the
    counterpart of the reference's Detectron2Handler (file_io.py:16-32),
    which maps detectron2:// onto the release bucket."""

    PREFIXES = ("cddmsl://", "detectron2://")

    def _get_supported_prefixes(self):
        return list(self.PREFIXES)

    def _get_local_path(self, path, **kwargs):
        for p in self.PREFIXES:
            if path.startswith(p):
                name = path[len(p):]
                break
        else:
            raise ValueError(
                f"{path}: not under a supported prefix {self.PREFIXES}"
            )
        local = os.path.join(_REPO_ROOT, name)
        if path.startswith("detectron2://") and not os.path.exists(local):
            # the reference maps detectron2:// onto its release bucket URL;
            # with no egress, fall back to the pre-populated HTTP cache by
            # basename (the same place a bucket download would have landed)
            cache_dir = os.environ.get(
                "CDDMSL_CACHE", os.path.expanduser("~/.cache/cddmsl")
            )
            cached = os.path.join(cache_dir, os.path.basename(name))
            if os.path.exists(cached):
                return cached
        return local


class _PathManager:
    def __init__(self):
        self._handlers = []
        self._native = _NativePathHandler()

    def register_handler(self, handler):
        assert isinstance(handler, PathHandler), handler
        self._handlers.append(handler)

    def _get_handler(self, path):
        for h in self._handlers:
            for prefix in h._get_supported_prefixes():
                if path.startswith(prefix):
                    return h
        return self._native

    def get_local_path(self, path, **kwargs):
        return self._get_handler(path)._get_local_path(path, **kwargs)

    def open(self, path, mode="r", **kwargs):
        return self._get_handler(path)._open(path, mode, **kwargs)

    def exists(self, path):
        try:
            return os.path.exists(self.get_local_path(path))
        except FileNotFoundError:
            return False

    def isfile(self, path):
        return os.path.isfile(self.get_local_path(path))

    def isdir(self, path):
        return os.path.isdir(self.get_local_path(path))

    def ls(self, path):
        return sorted(os.listdir(self.get_local_path(path)))

    def glob(self, pattern):
        return sorted(_glob.glob(self.get_local_path(pattern)))

    def mkdirs(self, path):
        os.makedirs(self.get_local_path(path), exist_ok=True)

    def copy(self, src, dst, overwrite=False):
        src, dst = self.get_local_path(src), self.get_local_path(dst)
        if os.path.exists(dst) and not overwrite:
            logger.error("Destination %s already exists", dst)
            return False
        shutil.copyfile(src, dst)
        return True

    def rm(self, path):
        os.remove(self.get_local_path(path))


PathManager = _PathManager()
PathManager.register_handler(HTTPURLHandler())
PathManager.register_handler(CDDMSLHandler())
