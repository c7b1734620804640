"""Minimal in-process S3-compatible endpoint for INTEGRATION TESTS.

The ``norename://`` backend proves the lake's object-store protocol
(versioned-pointer CAS commits, rename-free publish) over a pyarrow
FileSystem whose ``move`` raises — but it cannot prove the one code
path a real deployment adds: ``pyarrow.fs.S3FileSystem`` resolved via
``FileSystem.from_uri("s3://…")``, with genuine HTTP semantics
(ranged GETs for parquet footers, multipart uploads from the AWS SDK
output stream, ListObjectsV2 paging, DeleteObjects batches).  This
module is a ~300-line loopback implementation of exactly the API
subset the engine's storage layer exercises, so the whole replay /
txn / rescale protocol can run end-to-end through ``s3://`` URIs
inside the sandbox (no network beyond 127.0.0.1).

Supported: PutObject (plain and aws-chunked bodies), GetObject
(+Range), HeadObject, DeleteObject, DeleteObjects, CopyObject,
CreateBucket, HeadBucket, ListObjectsV2 (prefix + delimiter +
continuation), CreateMultipartUpload / UploadPart /
CompleteMultipartUpload / AbortMultipartUpload.  Signatures are
accepted and ignored — this is a protocol stub, not a security
boundary; it lives in scripts/ and is never imported by the engine.

Usage::

    with MiniS3() as srv:                 # picks a free port
        root = srv.uri("bucket/lake")     # s3://bucket/lake?endpoint_override=…
        TranscriptLake.create(root, ...)  # the engine sees plain s3://
"""

from __future__ import annotations

import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _dechunk_aws(body: bytes) -> bytes:
    """Strip aws-chunked framing (``hex-size[;chunk-signature=…]\r\n``
    prefixed chunks) that the AWS SDK uses for streaming-signed PUTs."""
    out = []
    i = 0
    while i < len(body):
        j = body.find(b"\r\n", i)
        if j < 0:
            break
        head = body[i:j].split(b";")[0]
        try:
            size = int(head, 16)
        except ValueError:
            return body  # not chunked after all
        if size == 0:
            break
        start = j + 2
        out.append(body[start : start + size])
        i = start + size + 2  # skip trailing CRLF
    return b"".join(out)


def _xml(body: str) -> bytes:
    return ('<?xml version="1.0" encoding="UTF-8"?>' + body).encode()


class _Store:
    def __init__(self):
        self.lock = threading.RLock()
        self.buckets: dict[str, dict[str, bytes]] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.upload_meta: dict[str, tuple[str, str]] = {}  # id -> (bucket, key)
        self._next_upload = [0]

    def new_upload(self, bucket: str, key: str) -> str:
        with self.lock:
            self._next_upload[0] += 1
            uid = f"up-{self._next_upload[0]:08d}"
            self.uploads[uid] = {}
            self.upload_meta[uid] = (bucket, key)
            return uid


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: _Store  # set on the class by MiniS3

    def log_message(self, *a):  # silence
        pass

    # -- helpers -------------------------------------------------------
    def _route(self):
        parsed = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(parsed.query, keep_blank_values=True)
        parts = parsed.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        return bucket, key, q

    def _read_body(self) -> bytes:
        if self.headers.get("Transfer-Encoding", "").lower() == "chunked":
            chunks = []
            while True:
                line = self.rfile.readline().strip()
                size = int(line.split(b";")[0], 16)
                if size == 0:
                    self.rfile.readline()
                    break
                chunks.append(self.rfile.read(size))
                self.rfile.readline()
            body = b"".join(chunks)
        else:
            n = int(self.headers.get("Content-Length", "0") or "0")
            body = self.rfile.read(n)
        sha = self.headers.get("x-amz-content-sha256", "")
        if sha.startswith("STREAMING-"):
            body = _dechunk_aws(body)
        return body

    def _send(self, code: int, body: bytes = b"", headers: dict | None = None):
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _not_found(self, what="NoSuchKey"):
        self._send(404, _xml(f"<Error><Code>{what}</Code></Error>"))

    # -- verbs ---------------------------------------------------------
    def do_HEAD(self):
        bucket, key, _ = self._route()
        with self.store.lock:
            b = self.store.buckets.get(bucket)
            if b is None:
                return self._send(404)
            if not key:
                return self._send(200)
            if key in b:
                data = b[key]
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.send_header("ETag", '"0"')
                self.send_header("Last-Modified", "Thu, 01 Jan 2026 00:00:00 GMT")
                self.send_header("Accept-Ranges", "bytes")
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                return
        self._send(404)

    def do_GET(self):
        bucket, key, q = self._route()
        with self.store.lock:
            b = self.store.buckets.get(bucket)
            if b is None:
                return self._not_found("NoSuchBucket")
            if not key:
                if "location" in q:
                    return self._send(
                        200,
                        _xml("<LocationConstraint></LocationConstraint>"),
                    )
                return self._list(bucket, b, q)
            data = b.get(key)
        if data is None:
            return self._not_found()
        rng = self.headers.get("Range")
        if rng:
            m = re.match(r"bytes=(\d*)-(\d*)", rng)
            lo = int(m.group(1)) if m.group(1) else 0
            hi = int(m.group(2)) if m.group(2) else len(data) - 1
            hi = min(hi, len(data) - 1)
            part = data[lo : hi + 1]
            return self._send(
                206,
                part,
                {
                    "Content-Range": f"bytes {lo}-{hi}/{len(data)}",
                    "Accept-Ranges": "bytes",
                    "ETag": '"0"',
                    "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
                },
            )
        self._send(
            200,
            data,
            {
                "ETag": '"0"',
                "Accept-Ranges": "bytes",
                "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
            },
        )

    def _list(self, bucket: str, b: dict, q: dict):
        prefix = q.get("prefix", [""])[0]
        delim = q.get("delimiter", [""])[0]
        token = q.get("continuation-token", [""])[0]
        max_keys = int(q.get("max-keys", ["1000"])[0])
        keys = sorted(k for k in b if k.startswith(prefix))
        if token:
            keys = [k for k in keys if k > token]
        contents, prefixes = [], []
        seen_pref = set()
        for k in keys:
            if delim:
                rest = k[len(prefix):]
                if delim in rest:
                    p = prefix + rest.split(delim, 1)[0] + delim
                    if p not in seen_pref:
                        seen_pref.add(p)
                        prefixes.append(p)
                    continue
            contents.append(k)
        truncated = len(contents) > max_keys
        contents = contents[:max_keys]
        xml = ["<ListBucketResult>"]
        xml.append(f"<Name>{bucket}</Name>")
        xml.append(f"<Prefix>{prefix}</Prefix>")
        xml.append(f"<KeyCount>{len(contents) + len(prefixes)}</KeyCount>")
        xml.append(f"<MaxKeys>{max_keys}</MaxKeys>")
        xml.append(f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>")
        if truncated and contents:
            xml.append(
                f"<NextContinuationToken>{contents[-1]}</NextContinuationToken>"
            )
        for k in contents:
            xml.append(
                "<Contents>"
                f"<Key>{k}</Key>"
                "<LastModified>2026-01-01T00:00:00.000Z</LastModified>"
                f"<Size>{len(b[k])}</Size>"
                '<ETag>"0"</ETag>'
                "<StorageClass>STANDARD</StorageClass>"
                "</Contents>"
            )
        for p in prefixes:
            xml.append(f"<CommonPrefixes><Prefix>{p}</Prefix></CommonPrefixes>")
        xml.append("</ListBucketResult>")
        self._send(200, _xml("".join(xml)), {"Content-Type": "application/xml"})

    def do_PUT(self):
        bucket, key, q = self._route()
        body = self._read_body()
        with self.store.lock:
            if not key:  # CreateBucket
                self.store.buckets.setdefault(bucket, {})
                return self._send(200)
            b = self.store.buckets.setdefault(bucket, {})
            if "partNumber" in q and "uploadId" in q:
                uid = q["uploadId"][0]
                if uid not in self.store.uploads:
                    return self._not_found("NoSuchUpload")
                self.store.uploads[uid][int(q["partNumber"][0])] = body
                return self._send(200, b"", {"ETag": '"0"'})
            src = self.headers.get("x-amz-copy-source")
            if src:
                sp = urllib.parse.unquote(src.lstrip("/")).split("/", 1)
                sb = self.store.buckets.get(sp[0], {})
                if len(sp) < 2 or sp[1] not in sb:
                    return self._not_found()
                b[key] = sb[sp[1]]
                return self._send(
                    200,
                    _xml(
                        "<CopyObjectResult><ETag>\"0\"</ETag>"
                        "<LastModified>2026-01-01T00:00:00.000Z</LastModified>"
                        "</CopyObjectResult>"
                    ),
                )
            b[key] = body
        self._send(200, b"", {"ETag": '"0"'})

    def do_POST(self):
        bucket, key, q = self._route()
        body = self._read_body()
        with self.store.lock:
            b = self.store.buckets.setdefault(bucket, {})
            if "uploads" in q:  # CreateMultipartUpload
                uid = self.store.new_upload(bucket, key)
                return self._send(
                    200,
                    _xml(
                        "<InitiateMultipartUploadResult>"
                        f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                        f"<UploadId>{uid}</UploadId>"
                        "</InitiateMultipartUploadResult>"
                    ),
                )
            if "uploadId" in q:  # CompleteMultipartUpload
                uid = q["uploadId"][0]
                parts = self.store.uploads.pop(uid, None)
                self.store.upload_meta.pop(uid, None)
                if parts is None:
                    return self._not_found("NoSuchUpload")
                b[key] = b"".join(parts[i] for i in sorted(parts))
                return self._send(
                    200,
                    _xml(
                        "<CompleteMultipartUploadResult>"
                        f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                        '<ETag>"0"</ETag>'
                        "</CompleteMultipartUploadResult>"
                    ),
                )
            if "delete" in q:  # DeleteObjects batch
                keys = re.findall(r"<Key>(.*?)</Key>", body.decode())
                deleted = []
                for k in keys:
                    k = urllib.parse.unquote(k)
                    b.pop(k, None)
                    deleted.append(f"<Deleted><Key>{k}</Key></Deleted>")
                return self._send(
                    200, _xml("<DeleteResult>" + "".join(deleted) + "</DeleteResult>")
                )
        self._send(400)

    def do_DELETE(self):
        bucket, key, q = self._route()
        with self.store.lock:
            if "uploadId" in q:
                self.store.uploads.pop(q["uploadId"][0], None)
                self.store.upload_meta.pop(q["uploadId"][0], None)
                return self._send(204)
            b = self.store.buckets.get(bucket)
            if b is None:
                return self._send(204)
            if not key:
                if b:
                    return self._send(
                        409, _xml("<Error><Code>BucketNotEmpty</Code></Error>")
                    )
                self.store.buckets.pop(bucket, None)
                return self._send(204)
            b.pop(key, None)
        self._send(204)


class MiniS3:
    """Threaded loopback S3 endpoint; context-manager lifecycle."""

    def __init__(self, port: int = 0):
        store = _Store()
        handler = type("BoundHandler", (_Handler,), {"store": store})
        self.server = ThreadingHTTPServer(("127.0.0.1", port), handler)
        self.store = store
        self.port = self.server.server_address[1]
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()
        self.server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def uri(self, path: str) -> str:
        """``s3://<path>?endpoint_override=…`` — a root string the
        engine's ``storage_for`` resolves via FileSystem.from_uri."""
        return (
            f"s3://ak:sk@{path}?endpoint_override=127.0.0.1%3A{self.port}"
            "&scheme=http&allow_bucket_creation=true&allow_bucket_deletion=true"
            "&region=us-east-1"
        )
