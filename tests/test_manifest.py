"""REST manifest control plane (S1-S3) — network isolated behind a fake
http_get; behaviors mirror /root/reference/main.py:35-116,347-369."""

from __future__ import annotations

import json

from be_analytic_etl_spark.sources.manifest import (
    HttpResponse,
    download,
    find_dataset_id,
    list_resources,
    resources_to_manifest,
)

BASE = "https://api.example.gov/dados"


def _fake(responses):
    """http_get stub: map url-substring -> (status, payload); records calls."""
    calls = []

    def get(url, headers):
        calls.append((url, dict(headers)))
        for frag, (status, payload) in responses.items():
            if frag in url:
                body = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
                return HttpResponse(status, body)
        return HttpResponse(404, b"")

    get.calls = calls
    return get


def test_find_dataset_id_first_match():
    get = _fake({"nomeConjuntoDados=IDA": (200, [{"id": 42, "nome": "IDA"}, {"id": 43}])})
    assert find_dataset_id(BASE, "IDA", api_key="k", http_get=get) == "42"
    # auth header was sent
    assert get.calls[0][1] == {"chave-api-dados-abertos": "k"}


def test_find_dataset_id_absent_or_error():
    assert find_dataset_id(BASE, "IDA", http_get=_fake({})) is None
    get = _fake({"nomeConjuntoDados": (500, [])})
    assert find_dataset_id(BASE, "IDA", http_get=get) is None


def test_list_resources():
    recursos = [{"titulo": "SMP 2019", "link": "http:\\\\x\\a.ods", "formato": "ODS"}]
    get = _fake({"/conjuntos-dados/42": (200, {"recursos": recursos})})
    assert list_resources(BASE, "42", http_get=get) == recursos


def test_download_auth_fallback():
    # with auth: 403; bare retry: 200 — reference's fallback behavior
    calls = []

    def get(url, headers):
        calls.append(dict(headers))
        return HttpResponse(200 if not headers else 403, b"bytes!")

    assert download("http://x/a.ods", api_key="k", http_get=get) == b"bytes!"
    assert calls == [{"chave-api-dados-abertos": "k"}, {}]


def test_manifest_roundtrip_through_filter(spark):
    from be_analytic_etl_spark.sources.ingest import filter_manifest

    recursos = [
        {"titulo": "SMP 2019", "link": "http:\\\\host\\smp.ods", "formato": "ODS"},
        {"titulo": "STFC 2020", "link": "http://host/stfc.csv", "formato": "CSV"},
        {"titulo": "Relatório geral", "link": "http://host/geral.pdf", "formato": "PDF"},
    ]
    mf = filter_manifest(resources_to_manifest(spark, recursos)).collect()
    assert {r["servico"] for r in mf} == {"SMP", "STFC"}
    by_serv = {r["servico"]: r for r in mf}
    assert by_serv["SMP"]["url"] == "http://host/smp.ods"  # backslash fix
    assert by_serv["SMP"]["ano"] == 2019
