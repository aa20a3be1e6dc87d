"""Filesystem abstraction: local / in-memory mock / S3, with URI dispatch.

Reference: cpp/src/arrow/filesystem/ — FileSystem API (filesystem.h),
LocalFileSystem, S3FileSystem (s3fs.h), MockFileSystem (mockfs.h), and
`FileSystemFromUri`. The heavy lifting (S3 auth, multipart, ...) rides on
pyarrow.fs (the same C++ impls); MockFileSystem is a pure-python
in-memory tree for tests, like the reference's mockfs.
"""

from __future__ import annotations

import io
import os
import posixpath
from typing import Dict, List, Optional, Tuple

from .errors import Invalid

__all__ = ["FileInfo", "LocalFileSystem", "MockFileSystem", "S3FileSystem",
           "filesystem_from_uri"]


class FileInfo:
    """Reference: filesystem.h FileInfo (path + type + size)."""

    __slots__ = ("path", "is_file", "size")

    def __init__(self, path: str, is_file: bool, size: int = 0):
        self.path = path
        self.is_file = is_file
        self.size = size

    def __repr__(self):
        kind = "file" if self.is_file else "dir"
        return f"FileInfo({self.path!r}, {kind}, {self.size})"


class FileSystem:
    def get_file_info(self, path: str) -> FileInfo:
        raise NotImplementedError

    def ls(self, path: str) -> List[FileInfo]:
        raise NotImplementedError

    def open_input(self, path: str):
        raise NotImplementedError

    def open_output(self, path: str):
        raise NotImplementedError

    def create_dir(self, path: str):
        raise NotImplementedError

    def delete(self, path: str):
        raise NotImplementedError


class LocalFileSystem(FileSystem):
    """Reference: filesystem/localfs.h."""

    def get_file_info(self, path):
        if os.path.isfile(path):
            return FileInfo(path, True, os.path.getsize(path))
        if os.path.isdir(path):
            return FileInfo(path, False)
        raise FileNotFoundError(path)

    def ls(self, path):
        out = []
        for name in sorted(os.listdir(path)):
            out.append(self.get_file_info(os.path.join(path, name)))
        return out

    def open_input(self, path):
        return open(path, "rb")

    def open_output(self, path):
        return open(path, "wb")

    def create_dir(self, path):
        os.makedirs(path, exist_ok=True)

    def delete(self, path):
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        else:
            os.remove(path)


class _MockOutput(io.BytesIO):
    def __init__(self, fs, path):
        super().__init__()
        self._fs = fs
        self._path = path

    def close(self):
        self._fs._files[self._path] = self.getvalue()
        super().close()


class MockFileSystem(FileSystem):
    """In-memory tree (reference: filesystem/mockfs.h)."""

    def __init__(self):
        self._files: Dict[str, bytes] = {}
        self._dirs = {""}

    def get_file_info(self, path):
        path = path.strip("/")
        if path in self._files:
            return FileInfo(path, True, len(self._files[path]))
        if path in self._dirs or any(f.startswith(path + "/")
                                     for f in self._files):
            return FileInfo(path, False)
        raise FileNotFoundError(path)

    def ls(self, path):
        path = path.strip("/")
        prefix = path + "/" if path else ""
        seen = {}
        for f in self._files:
            if not f.startswith(prefix):
                continue
            rest = f[len(prefix):]
            head = rest.split("/", 1)[0]
            full = prefix + head
            if "/" in rest:
                seen[full] = FileInfo(full, False)
            else:
                seen[full] = FileInfo(full, True, len(self._files[f]))
        return [seen[k] for k in sorted(seen)]

    def open_input(self, path):
        path = path.strip("/")
        if path not in self._files:
            raise FileNotFoundError(path)
        return io.BytesIO(self._files[path])

    def open_output(self, path):
        path = path.strip("/")
        parent = posixpath.dirname(path)
        self._dirs.add(parent)
        return _MockOutput(self, path)

    def create_dir(self, path):
        self._dirs.add(path.strip("/"))

    def delete(self, path):
        path = path.strip("/")
        if path in self._files:
            del self._files[path]
        else:
            for f in [f for f in self._files if f.startswith(path + "/")]:
                del self._files[f]
            self._dirs.discard(path)


def S3FileSystem(*args, use_pyarrow: bool = False, **kwargs):
    """S3 (reference: filesystem/s3fs.h). Default: the native SigV4/REST
    client (fs_s3.py — no SDK). `use_pyarrow=True` selects the
    AWS-SDK-backed pyarrow implementation instead."""
    if use_pyarrow:
        return PyArrowS3FileSystem(*args, **kwargs)
    from .fs_s3 import NativeS3FileSystem

    return NativeS3FileSystem(*args, **kwargs)


class PyArrowS3FileSystem(FileSystem):
    """S3 via pyarrow.fs (the AWS C++ SDK the reference links)."""

    def __init__(self, **kwargs):
        from pyarrow import fs as pafs

        self._fs = pafs.S3FileSystem(**kwargs)

    def get_file_info(self, path):
        from pyarrow import fs as pafs

        info = self._fs.get_file_info(path)
        if info.type == pafs.FileType.NotFound:
            raise FileNotFoundError(path)
        return FileInfo(path, info.type == pafs.FileType.File,
                        info.size or 0)

    def ls(self, path):
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(path)
        return [FileInfo(i.path, i.type == pafs.FileType.File, i.size or 0)
                for i in self._fs.get_file_info(sel)]

    def open_input(self, path):
        return self._fs.open_input_file(path)

    def open_output(self, path):
        return self._fs.open_output_stream(path)

    def create_dir(self, path):
        self._fs.create_dir(path)

    def delete(self, path):
        self._fs.delete_file(path)


class HadoopFileSystem(FileSystem):
    """HDFS via pyarrow.fs (reference: filesystem/hdfs.h — libhdfs JNI
    bridge there; same bridge underneath here). Gated: raises a clear
    error when the environment has no hadoop client libraries.

    This is the documented FALLBACK for clusters that only expose the
    native RPC protocol; `hdfs://` / `webhdfs://` URIs dispatch to the
    native no-JNI WebHDFS client (fs_hdfs.WebHdfsFileSystem) first."""

    def __init__(self, host: str = "default", port: int = 8020, **kwargs):
        try:
            from pyarrow import fs as pafs

            self._fs = pafs.HadoopFileSystem(host, port, **kwargs)
        except (ImportError, OSError) as e:
            raise Invalid(
                f"HDFS unavailable: libhdfs not found in this environment "
                f"({e}). Install a hadoop client to use hdfs:// paths."
            ) from e

    get_file_info = PyArrowS3FileSystem.get_file_info
    ls = PyArrowS3FileSystem.ls
    open_input = PyArrowS3FileSystem.open_input
    open_output = PyArrowS3FileSystem.open_output
    create_dir = PyArrowS3FileSystem.create_dir
    delete = PyArrowS3FileSystem.delete


def filesystem_from_uri(uri: str) -> Tuple[FileSystem, str]:
    """URI dispatch (reference: filesystem.cc FileSystemFromUri)."""
    if uri.startswith("s3://"):
        return S3FileSystem(), uri[len("s3://"):]
    if uri.startswith(("hdfs://", "webhdfs://")):
        # native WebHDFS REST client (fs_hdfs.py) — no libhdfs/JNI on
        # the path; the pyarrow-backed HadoopFileSystem class remains
        # available for RPC-only clusters
        from .fs_hdfs import WebHdfsFileSystem

        scheme, _, rest = uri.partition("://")
        hostport, _, path = rest.partition("/")
        user = None
        if "@" in hostport:
            user, _, hostport = hostport.partition("@")
        host, _, port = hostport.partition(":")
        # 8020/9000 are the HDFS RPC ports; WebHDFS listens on 9870
        web_port = int(port) if port and port not in ("8020", "9000") \
            else 9870
        kw = {"user": user} if user else {}
        return (WebHdfsFileSystem(host or "localhost", web_port, **kw),
                "/" + path)
    if uri.startswith("file://"):
        return LocalFileSystem(), uri[len("file://"):]
    if uri.startswith("mock://"):
        return MockFileSystem(), uri[len("mock://"):]
    if "://" in uri:
        raise Invalid(f"unsupported filesystem uri {uri!r}")
    return LocalFileSystem(), uri


# ====================================================================
# pyarrow.fs namespace parity (python/pyarrow/fs.py surface)
# ====================================================================

import enum


class FileType(enum.IntEnum):
    """Reference: filesystem.h FileType enum."""
    NotFound = 0
    Unknown = 1
    File = 2
    Directory = 3


# pyarrow-era alias (FileStats was renamed FileInfo upstream)
FileStats = FileInfo


def _info_type(info: FileInfo) -> FileType:
    return FileType.File if info.is_file else FileType.Directory


FileInfo.type = property(_info_type)


class FileSelector:
    """Reference: filesystem.h FileSelector (recursive listing spec)."""

    __slots__ = ("base_dir", "recursive", "allow_not_found")

    def __init__(self, base_dir: str, allow_not_found: bool = False,
                 recursive: bool = False):
        self.base_dir = base_dir
        self.allow_not_found = allow_not_found
        self.recursive = recursive


class SubTreeFileSystem(FileSystem):
    """All paths rooted under a prefix of a base filesystem
    (reference: filesystem.h SubTreeFileSystem)."""

    def __init__(self, base_path: str, base_fs: FileSystem):
        self.base_path = base_path.rstrip("/")
        self.base_fs = base_fs

    def _full(self, path: str) -> str:
        return posixpath.join(self.base_path, path.lstrip("/")) \
            if path else self.base_path

    def get_file_info(self, path):
        return self.base_fs.get_file_info(self._full(path))

    def ls(self, path):
        return self.base_fs.ls(self._full(path))

    def open_input(self, path):
        return self.base_fs.open_input(self._full(path))

    def open_output(self, path):
        return self.base_fs.open_output(self._full(path))

    def create_dir(self, path):
        return self.base_fs.create_dir(self._full(path))

    def delete(self, path):
        return self.base_fs.delete(self._full(path))


class FileSystemHandler:
    """Duck-type interface for PyFileSystem handlers
    (reference: python/pyarrow/fs.py FileSystemHandler)."""


class FSSpecHandler(FileSystemHandler):
    """Adapter over an fsspec-style filesystem object."""

    def __init__(self, fs):
        self.fs = fs


class PyFileSystem(FileSystem):
    """FileSystem backed by a python handler (fsspec adapter included),
    reference: python/pyarrow/fs.py PyFileSystem."""

    def __init__(self, handler):
        self.handler = handler
        self._fs = getattr(handler, "fs", handler)

    def get_file_info(self, path):
        if self._fs.isfile(path):
            return FileInfo(path, True, self._fs.size(path))
        if self._fs.isdir(path):
            return FileInfo(path, False)
        raise FileNotFoundError(path)

    def ls(self, path):
        return [self.get_file_info(p) for p in sorted(self._fs.ls(path))]

    def open_input(self, path):
        return self._fs.open(path, "rb")

    def open_output(self, path):
        return self._fs.open(path, "wb")

    def create_dir(self, path):
        self._fs.makedirs(path, exist_ok=True)

    def delete(self, path):
        self._fs.rm(path, recursive=True)


def copy_files(source: str, destination: str,
               source_filesystem: Optional[FileSystem] = None,
               destination_filesystem: Optional[FileSystem] = None,
               chunk_size: int = 1 << 20, use_threads: bool = True):
    """Recursive copy between filesystems
    (reference: filesystem.h CopyFiles)."""
    sfs = source_filesystem or LocalFileSystem()
    dfs = destination_filesystem or LocalFileSystem()
    info = sfs.get_file_info(source)

    def copy_one(src_path, dst_path):
        with sfs.open_input(src_path) as r, \
                dfs.open_output(dst_path) as w:
            while True:
                chunk = r.read(chunk_size)
                if not chunk:
                    break
                w.write(chunk)

    if info.is_file:
        copy_one(source, destination)
        return
    dfs.create_dir(destination)
    for child in sfs.ls(source):
        name = posixpath.basename(child.path.rstrip("/")) or \
            os.path.basename(child.path.rstrip(os.sep))
        copy_files(child.path, posixpath.join(destination, name),
                   sfs, dfs, chunk_size, use_threads)


def GcsFileSystem(*args, **kwargs):
    import pyarrow.fs as pafs

    return pafs.GcsFileSystem(*args, **kwargs)


def AzureFileSystem(*args, **kwargs):
    import pyarrow.fs as pafs

    return pafs.AzureFileSystem(*args, **kwargs)


# ---- S3 module-level helpers (shape parity; the native SigV4 client in
# fs_s3.py needs no global init) ----

def initialize_s3(log_level=None, num_event_loop_threads: int = 1):
    return None


def ensure_s3_initialized():
    return None


def finalize_s3():
    return None


def ensure_s3_finalized():
    return None


def resolve_s3_region(bucket: str) -> str:
    """Region via a HEAD on the bucket endpoint (needs network access)."""
    from .fs_s3 import NativeS3FileSystem

    fs = NativeS3FileSystem()
    return fs.resolve_region(bucket) if hasattr(fs, "resolve_region") \
        else "us-east-1"


class S3LogLevel(enum.IntEnum):
    Off = 0
    Fatal = 1
    Error = 2
    Warn = 3
    Info = 4
    Debug = 5
    Trace = 6


class S3RetryStrategy:
    def __init__(self, max_attempts: int = 3):
        self.max_attempts = max_attempts


class AwsStandardS3RetryStrategy(S3RetryStrategy):
    pass


class AwsDefaultS3RetryStrategy(S3RetryStrategy):
    pass
