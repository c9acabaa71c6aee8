"""Driver-side control plane for a dados.gov.br-style REST dataset API.

Re-expresses the reference's extract discovery chain (S1-S3):

- dataset-id lookup by name        (``/root/reference/main.py:35-85``)   S1
- resource listing for a dataset   (``/root/reference/main.py:88-116``)  S2
- binary download with auth-header fallback on non-200
                                   (``/root/reference/main.py:347-369``) S3

These are control plane, not data plane: tiny JSON/HTTP driver-side calls
that produce a *manifest* (a small DataFrame of resource url/title/format
rows) which `ingest.filter_manifest` filters and the per-file ingest
pipeline consumes. Network access is isolated behind an injectable
``http_get`` callable so tests and offline runs never open a socket; the
default implementation uses only the standard library.
"""

from __future__ import annotations

import json as _json
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class HttpResponse:
    status: int
    content: bytes

    def json(self):
        return _json.loads(self.content.decode("utf-8"))


HttpGet = Callable[[str, dict], HttpResponse]


def _stdlib_http_get(url: str, headers: dict) -> HttpResponse:
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return HttpResponse(resp.status, resp.read())
    except urllib.error.HTTPError as e:  # non-2xx still carries a status
        return HttpResponse(e.code, e.read())


def _auth_headers(api_key: str | None) -> dict:
    return {"chave-api-dados-abertos": api_key} if api_key else {}


def find_dataset_id(
    base_url: str,
    dataset_name: str,
    api_key: str | None = None,
    http_get: HttpGet = _stdlib_http_get,
) -> str | None:
    """S1: look up a dataset id by name; first match wins, None if absent."""
    url = f"{base_url}/conjuntos-dados?nomeConjuntoDados={urllib.parse.quote(dataset_name)}"
    resp = http_get(url, _auth_headers(api_key))
    if resp.status != 200:
        return None
    data = resp.json()
    items = data if isinstance(data, list) else data.get("conjuntosDados", [])
    for item in items:
        if item.get("id"):
            return str(item["id"])
    return None


def list_resources(
    base_url: str,
    dataset_id: str,
    api_key: str | None = None,
    http_get: HttpGet = _stdlib_http_get,
) -> list[dict]:
    """S2: list a dataset's resources (url/titulo/formato dicts)."""
    resp = http_get(f"{base_url}/conjuntos-dados/{dataset_id}", _auth_headers(api_key))
    if resp.status != 200:
        return []
    return resp.json().get("recursos", [])


def download(
    url: str,
    api_key: str | None = None,
    http_get: HttpGet = _stdlib_http_get,
) -> bytes | None:
    """S3: fetch a resource; on a non-200 with auth headers, retry bare
    (the reference's fallback for resources that reject the auth header)."""
    headers = _auth_headers(api_key)
    resp = http_get(url, headers)
    if resp.status != 200 and headers:
        resp = http_get(url, {})
    return resp.content if resp.status == 200 else None


def resources_to_manifest(spark: SparkSession, recursos: list[dict]) -> DataFrame:
    """Lift the resource dicts into the manifest DataFrame that
    ``ingest.filter_manifest`` consumes (titulo/url/formato columns; extra
    keys preserved as available)."""
    rows = [
        (
            str(r.get("titulo", "") or ""),
            str(r.get("link", r.get("url", "")) or ""),
            str(r.get("formato", "") or ""),
        )
        for r in recursos
    ]
    return spark.createDataFrame(rows, "titulo string, url string, formato string")
