"""Native S3 filesystem (arrow1_tpu/fs_s3.py).

- SigV4 signer against the official AWS documentation vector (the
  ListUsers example: its documented canonical-request SHA256 is
  f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59).
- Full filesystem surface against an in-process mock S3 server speaking
  the real REST dialect (HEAD/GET+Range/PUT/DELETE/ListObjectsV2/
  multipart), which also re-verifies every request's SigV4 signature
  server-side.
Reference surface: cpp/src/arrow/filesystem/s3fs.h.
"""

import hashlib
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from arrow1_tpu.fs import FileInfo
from arrow1_tpu.fs_s3 import NativeS3FileSystem, sigv4_sign

ACCESS, SECRET, REGION = "AKIDTEST", "sekrit", "us-east-1"


def test_sigv4_official_vector():
    out = sigv4_sign(
        "GET", "iam.amazonaws.com", "/",
        [("Action", "ListUsers"), ("Version", "2010-05-08")],
        {"content-type":
         "application/x-www-form-urlencoded; charset=utf-8"},
        hashlib.sha256(b"").hexdigest(),
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG/bPxRfiCYEXAMPLEKEY",
        "us-east-1", "iam", "20150830T123600Z")
    assert out["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, "
        "Signature="
        "33f5dad2191de0cb4b7ab912f876876c2c4f72e2991a458f9499233c7b992438")


class _MockS3(BaseHTTPRequestHandler):
    """Enough of the S3 REST dialect for the client surface, with
    server-side SigV4 verification of every request."""

    protocol_version = "HTTP/1.1"
    store = {}          # (bucket, key) -> bytes
    uploads = {}        # upload_id -> {part#: bytes}
    fail_signature = []

    def log_message(self, *a):
        pass

    def _verify_sig(self, body: bytes) -> bool:
        auth = self.headers.get("Authorization", "")
        amz_date = self.headers.get("x-amz-date", "")
        if not auth or not amz_date:
            return False
        path, _, qs = self.path.partition("?")
        query = urllib.parse.parse_qsl(qs, keep_blank_values=True)
        payload_hash = self.headers.get("x-amz-content-sha256",
                                        hashlib.sha256(body).hexdigest())
        # S3 canonical URI = raw request path (single-encoded, verbatim)
        expect = sigv4_sign(
            self.command, self.headers["Host"],
            path, query,
            {k.lower(): v for k, v in self.headers.items()
             if k.lower() in ("range", "content-type")},
            payload_hash, ACCESS, SECRET, REGION, "s3", amz_date)
        ok = auth == expect["Authorization"]
        if not ok:
            _MockS3.fail_signature.append((auth, expect["Authorization"]))
        return ok

    def _split(self):
        path, _, qs = self.path.partition("?")
        parts = urllib.parse.unquote(path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        return bucket, key, dict(
            urllib.parse.parse_qsl(qs, keep_blank_values=True))

    def _reply(self, status, body=b"", headers=()):
        self.send_response(status)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_HEAD(self):
        bucket, key, _ = self._split()
        data = self.store.get((bucket, key))
        if data is None:
            self._reply(404)
        else:
            self._reply(200, b"",
                        [("Content-Length-Real", str(len(data)))])
            return

    # HEAD must carry Content-Length of the object, not of the body
    def send_header(self, k, v):
        if (k == "Content-Length" and self.command == "HEAD"):
            bucket, key, _ = self._split()
            data = self.store.get((bucket, key))
            if data is not None:
                v = str(len(data))
        if k == "Content-Length-Real":
            return
        super().send_header(k, v)

    def do_GET(self):
        if not self._verify_sig(b""):
            self._reply(403)
            return
        bucket, key, q = self._split()
        if "list-type" in q:
            self._list(bucket, q)
            return
        data = self.store.get((bucket, key))
        if data is None:
            self._reply(404)
            return
        rng = self.headers.get("Range")
        if rng:
            spec = rng.split("=")[1]
            lo, hi = spec.split("-")
            lo = int(lo)
            hi = min(int(hi), len(data) - 1) if hi else len(data) - 1
            self._reply(206, data[lo:hi + 1])
        else:
            self._reply(200, data)

    def _list(self, bucket, q):
        prefix = q.get("prefix", "")
        delim = q.get("delimiter", "")
        keys = sorted(k for b, k in self.store if b == bucket
                      and k.startswith(prefix))
        contents, prefixes = [], []
        for k in keys:
            rest = k[len(prefix):]
            if delim and delim in rest:
                p = prefix + rest.split(delim)[0] + delim
                if p not in prefixes:
                    prefixes.append(p)
            else:
                contents.append(k)
        xml = ["<?xml version=\"1.0\"?><ListBucketResult>",
               "<IsTruncated>false</IsTruncated>"]
        for k in contents:
            xml.append(f"<Contents><Key>{k}</Key>"
                       f"<Size>{len(self.store[(bucket, k)])}</Size>"
                       "</Contents>")
        for p in prefixes:
            xml.append(f"<CommonPrefixes><Prefix>{p}</Prefix>"
                       "</CommonPrefixes>")
        xml.append("</ListBucketResult>")
        self._reply(200, "".join(xml).encode())

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def do_PUT(self):
        body = self._body()
        if not self._verify_sig(body):
            self._reply(403)
            return
        bucket, key, q = self._split()
        if "partNumber" in q:
            up = self.uploads[q["uploadId"]]
            up[int(q["partNumber"])] = body
            self._reply(200, b"", [("ETag", f'"p{q["partNumber"]}"')])
            return
        self.store[(bucket, key)] = body
        self._reply(200, b"", [("ETag", '"x"')])

    def do_POST(self):
        body = self._body()
        if not self._verify_sig(body):
            self._reply(403)
            return
        bucket, key, q = self._split()
        if "uploads" in q:
            uid = f"up{len(self.uploads)}"
            self.uploads[uid] = {}
            self._reply(200, (f"<InitiateMultipartUploadResult>"
                              f"<UploadId>{uid}</UploadId>"
                              f"</InitiateMultipartUploadResult>").encode())
            return
        if "uploadId" in q:
            parts = self.uploads.pop(q["uploadId"])
            self.store[(bucket, key)] = b"".join(
                parts[i] for i in sorted(parts))
            self._reply(200, b"<CompleteMultipartUploadResult/>")
            return
        self._reply(400)

    def do_DELETE(self):
        if not self._verify_sig(b""):
            self._reply(403)
            return
        bucket, key, _ = self._split()
        self.store.pop((bucket, key), None)
        self._reply(204)


@pytest.fixture()
def s3fs():
    _MockS3.store = {}
    _MockS3.uploads = {}
    _MockS3.fail_signature = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockS3)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    fs = NativeS3FileSystem(
        access_key=ACCESS, secret_key=SECRET, region=REGION,
        endpoint_override=f"127.0.0.1:{server.server_port}",
        scheme="http", part_size=1 << 16)
    yield fs
    server.shutdown()
    assert not _MockS3.fail_signature, _MockS3.fail_signature[0]


class TestNativeS3:
    def test_put_get_head_roundtrip(self, s3fs):
        with s3fs.open_output("bkt/dir/a.bin") as f:
            f.write(b"hello s3")
        info = s3fs.get_file_info("bkt/dir/a.bin")
        assert info.is_file and info.size == 8
        with s3fs.open_input("bkt/dir/a.bin") as f:
            assert f.read() == b"hello s3"

    def test_ranged_reads_and_seek(self, s3fs):
        data = bytes(range(256)) * 64  # 16 KiB
        with s3fs.open_output("bkt/r.bin") as f:
            f.write(data)
        f = s3fs.open_input("bkt/r.bin")
        f.seek(1000)
        assert f.read(10) == data[1000:1010]
        f.seek(-16, 2)
        assert f.read() == data[-16:]
        f.seek(0)
        assert f.read(3) == data[:3]

    def test_multipart_upload(self, s3fs):
        # part_size is 64 KiB in the fixture; write 200 KiB -> 4 parts
        blob = bytes(range(251)) * 800
        with s3fs.open_output("bkt/big.bin") as f:
            # stress the buffering with uneven writes
            for i in range(0, len(blob), 7777):
                f.write(blob[i:i + 7777])
        assert _MockS3.store[("bkt", "big.bin")] == blob
        with s3fs.open_input("bkt/big.bin") as f:
            assert f.read() == blob

    def test_ls_with_delimiter(self, s3fs):
        for k in ("a/x.txt", "a/y.txt", "a/sub/z.txt", "top.txt"):
            with s3fs.open_output(f"bkt/{k}") as f:
                f.write(b"v")
        ls = s3fs.ls("bkt/a")
        names = [(fi.path, fi.is_file) for fi in ls]
        assert names == [("bkt/a/sub", False), ("bkt/a/x.txt", True),
                         ("bkt/a/y.txt", True)]
        root = s3fs.ls("bkt")
        assert ("bkt/top.txt", True) in [(fi.path, fi.is_file)
                                         for fi in root]

    def test_delete_file_and_prefix(self, s3fs):
        for k in ("d/1", "d/2", "solo"):
            with s3fs.open_output(f"bkt/{k}") as f:
                f.write(b"v")
        s3fs.delete("bkt/solo")
        with pytest.raises(FileNotFoundError):
            s3fs.get_file_info("bkt/solo")
        s3fs.delete("bkt/d")  # prefix delete
        assert ("bkt", "d/1") not in _MockS3.store
        assert ("bkt", "d/2") not in _MockS3.store

    def test_encoded_keys_sign_correctly(self, s3fs):
        # keys needing percent-encoding: the canonical URI must be the
        # single-encoded path, not a re-encoding of it
        for key in ("bkt/my file.txt", "bkt/a+b=c.bin", "bkt/ünïcode"):
            with s3fs.open_output(key) as f:
                f.write(b"enc")
            assert s3fs.get_file_info(key).size == 3
            with s3fs.open_input(key) as f:
                assert f.read() == b"enc"
            s3fs.delete(key)

    def test_bucket_root_is_directory(self, s3fs):
        with s3fs.open_output("bkt/x") as f:
            f.write(b"v")
        info = s3fs.get_file_info("bkt")
        assert not info.is_file

    def test_missing_raises(self, s3fs):
        with pytest.raises(FileNotFoundError):
            s3fs.get_file_info("bkt/nope")
        with pytest.raises(FileNotFoundError):
            s3fs.open_input("bkt/nope")

    def test_dir_info(self, s3fs):
        with s3fs.open_output("bkt/p/q/file") as f:
            f.write(b"v")
        info = s3fs.get_file_info("bkt/p")
        assert not info.is_file

    def test_dataset_over_s3(self, s3fs):
        """End-to-end: write an IPC file into S3, read it back through
        the seekable input file."""
        import arrow1_tpu as a1t
        from arrow1_tpu.io import ipc_native

        rb = a1t.record_batch({"x": [1, 2, 3], "s": ["a", "b", "a"]})
        import io as _io

        buf = _io.BytesIO()
        ipc_native.write_file(buf, rb)
        with s3fs.open_output("bkt/data/t.arrow") as f:
            f.write(buf.getvalue())
        with s3fs.open_input("bkt/data/t.arrow") as f:
            batches = ipc_native.read_file(f)
        assert batches[0].to_arrow().equals(rb.to_arrow())
