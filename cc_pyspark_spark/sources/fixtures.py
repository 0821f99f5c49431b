"""Deterministic WARC/WAT/WET fixture corpus (FIXTURES.md §1/§6 shapes).

Generates a small archive directory without network access: WARC files
with HTTP responses (HTML payloads with links/metas, multi-valued and
missing Server headers, redirects with Location), robots.txt responses
(valid/relative/latin-1-broken Sitemap lines), WET conversion records,
WAT JSON metadata records, and a cc-index-style coordinate parquet that
joins back to the records by (filename, offset, length).

Seeded (42) and wall-clock-free so job tests are hash-stable.
"""

from __future__ import annotations

import json
import os
import random

from cc_pyspark_spark.sources.warcio_lite import WarcWriter, http_response_block

SERVERS = ["Apache", "nginx", "Apache/2.4.7 (Ubuntu)", "cloudflare", None]
TLDS = ["com", "org", "net", "de", "invalid"]


def _html(url: str, links: list[str], rng: random.Random) -> bytes:
    metas = '<meta property="og:url" content="{}">'.format(url)
    body = "".join(f'<a href="{l}">x</a>' for l in links)
    tags = "".join(
        rng.choice(["<div>", "<p>", "<span>", "<b>", "<img src='x.png'>"])
        for _ in range(rng.randint(1, 6))
    )
    return (
        f"<html><head><title>t</title>{metas}</head>"
        f"<body>{tags}{body}</body></html>"
    ).encode()


def generate_warc_corpus(
    out_dir: str, n_files: int = 4, responses_per_file: int = 12, seed: int = 42
) -> dict:
    """Write the corpus; return manifest path + per-kind coordinates."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    coords = []  # (url, filename, offset, length)

    for fi in range(n_files):
        fname = os.path.join(out_dir, f"crawl-{fi:02d}.warc.gz")
        with open(fname, "wb") as fh:
            w = WarcWriter(fh, gzip_members=True)
            w.write_record(
                "warcinfo",
                b"software: cc-pyspark-spark-fixtures\r\n",
                content_type="application/warc-fields",
            )
            for ri in range(responses_per_file):
                host = f"site{rng.randint(0, 9)}.example.{rng.choice(TLDS)}"
                url = f"http://www.{host}/page{ri}"
                # request record (filtered out by most jobs)
                w.write_record(
                    "request",
                    b"GET /page HTTP/1.1\r\nHost: x\r\n\r\n",
                    target_uri=url,
                    content_type='application/http; msgtype=request',
                )
                hdrs = [("Content-Type", "text/html; charset=utf-8")]
                server = rng.choice(SERVERS)
                if server:
                    hdrs.append(("Server", server))
                    if rng.random() < 0.15:  # multi-valued Server (~2%↑ for tests)
                        hdrs.append(("Server", "varnish"))
                redirect = rng.random() < 0.1
                if redirect:
                    status = rng.choice([301, 302])
                    hdrs.append(("Location", f"http://other.example.com/p{ri}"))
                    payload = b""
                else:
                    status = 200
                    links = [
                        f"http://site{rng.randint(0, 9)}.example."
                        f"{rng.choice(TLDS)}/l{j}"
                        for j in range(rng.randint(0, 4))
                    ] + [f"/rel{ri}"]
                    payload = _html(url, links, rng)
                block = http_response_block(payload, status=status, headers=hdrs)
                off, length = w.write_record(
                    "response",
                    block,
                    target_uri=url,
                    content_type='application/http; msgtype=response',
                    ip_address=(
                        f"10.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
                        if rng.random() > 0.1
                        else None
                    ),
                    identified_payload_type=(
                        "text/html" if not redirect and rng.random() < 0.7 else None
                    ),
                )
                coords.append((url, fname, off, length))
        manifest.append(fname)

    # robots.txt file (subset=robotstxt path convention, wat_extract_links.py:41)
    robots_name = os.path.join(out_dir, "robotstxt", "robots-00.warc.gz")
    os.makedirs(os.path.dirname(robots_name), exist_ok=True)
    robots_bodies = [
        ("http://www.example.com/robots.txt",
         b"User-agent: *\r\nSitemap: http://www.example.com/sitemap.xml\r\n"),
        ("http://sub.example.org/robots.txt",
         b"sitemap: /relative-sitemap.xml\r\nDisallow: /\r\n"),
        ("http://www.example.com/robots.txt",  # second host announcing same sitemap
         b"SITEMAP: http://www.example.com/sitemap.xml\r\n"),
        ("http://latin1.example.net/robots.txt",
         "Sitemap: http://latin1.example.net/sitemäp.xml\r\n".encode("latin-1")),
        ("http://nolinks.example.com/robots.txt", b"User-agent: *\r\nAllow: /\r\n"),
    ]
    with open(robots_name, "wb") as fh:
        w = WarcWriter(fh, gzip_members=True)
        for url, body in robots_bodies:
            block = http_response_block(
                body, status=200, headers=[("Content-Type", "text/plain")]
            )
            w.write_record(
                "response",
                block,
                target_uri=url,
                content_type='application/http; msgtype=response',
            )
    manifest.append(robots_name)

    # WET file: conversion records with plain text
    wet_name = os.path.join(out_dir, "crawl-00.warc.wet.gz")
    vocab = ("the quick brown fox jumps over lazy dog spark shuffle "
             "wörld héllo 中文").split()
    with open(wet_name, "wb") as fh:
        w = WarcWriter(fh, gzip_members=True)
        for di in range(10):
            words = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
            w.write_record(
                "conversion",
                " ".join(words).encode(),
                target_uri=f"http://wet.example.com/doc{di}",
                content_type="text/plain",
            )
    manifest.append(wet_name)

    # WAT file: metadata records exercising the full link-tree surface
    # (Headers link/content-location, Head Base/Link/Metas/Scripts, body
    # Links with url/relative-href/absolute-href, no-link self-edge case)
    wat_name = os.path.join(out_dir, "crawl-00.warc.wat.gz")
    with open(wat_name, "wb") as fh:
        w = WarcWriter(fh, gzip_members=True)
        for mi in range(10):
            url = f"http://wat{mi % 3}.example.com/p{mi}"
            links = []
            for _ in range(rng.randint(0, 3)):
                kind = rng.random()
                tgt = f"http://tgt{rng.randint(0, 4)}.example.com/x"
                if kind < 0.5:
                    links.append({"path": "A@/href", "url": tgt})
                elif kind < 0.75:
                    links.append({"path": "A@/href", "href": f"//cdn{rng.randint(0,2)}.example.net/y"})
                else:
                    links.append({"path": "A@/href", "href": f"/relative{rng.randint(0,9)}"})
            meta_root = {
                "Headers": {"Server": rng.choice(SERVERS[:3]) or "Apache"},
                "HTML-Metadata": {"Links": links},
            }
            if rng.random() < 0.4:
                # real WAT data holds a string OR a JSON list here
                # (wat_extract_links.py:164-177) — exercise both
                if rng.random() < 0.5:
                    meta_root["Headers"]["Link"] = (
                        f"<http://hdr{rng.randint(0, 2)}.example.com/l>; rel=preload"
                    )
                else:
                    meta_root["Headers"]["Link"] = [
                        f"<http://hdr{rng.randint(0, 2)}.example.com/l>; rel=preload",
                        f"<http://hdr{rng.randint(0, 2)}.example.com/m>; rel=next",
                    ]
            if rng.random() < 0.3:
                cloc = f"http://cloc{rng.randint(0, 2)}.example.com/c"
                meta_root["Headers"]["Content-Location"] = (
                    cloc if rng.random() < 0.5 else [cloc, cloc + "2"]
                )
            head = {}
            if rng.random() < 0.3:
                head["Base"] = f"http://base{mi % 2}.example.com/dir/"
            if rng.random() < 0.5:
                head["Link"] = [
                    {"url": f"http://css{rng.randint(0, 2)}.example.com/s.css"}
                ]
            if rng.random() < 0.6:
                head["Metas"] = [
                    {"property": "og:url", "content": url},
                    {"name": "viewport", "content": "width=device-width"},
                    {"name": "thumbnail", "content": f"http://img{rng.randint(0,2)}.example.com/t.png"},
                ]
            if rng.random() < 0.4:
                head["Scripts"] = [
                    {"url": f"http://js{rng.randint(0, 2)}.example.com/a.js"}
                ]
            if head:
                meta_root["HTML-Metadata"]["Head"] = head
            envelope = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Type": "response" if mi != 9 else "request",
                        "WARC-Target-URI": url,
                    },
                    "Payload-Metadata": {"HTTP-Response-Metadata": meta_root},
                }
            }
            w.write_record(
                "metadata",
                json.dumps(envelope).encode(),
                target_uri=url,
                content_type="application/json",
            )
    manifest.append(wat_name)

    manifest_path = os.path.join(out_dir, "manifest.txt")
    with open(manifest_path, "w") as fh:
        fh.write("\n".join(manifest) + "\n")

    coords_path = os.path.join(out_dir, "ccindex.parquet")
    try:
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.parquet as pq  # noqa: PLC0415

        urls, files, offs, lens = zip(*coords)
        pq.write_table(
            pa.table(
                {
                    "url": list(urls),
                    "warc_filename": list(files),
                    "warc_record_offset": list(offs),
                    "warc_record_length": list(lens),
                }
            ),
            coords_path,
        )
    except ImportError:  # pragma: no cover
        coords_path = None

    return {
        "manifest": manifest_path,
        "files": manifest,
        "coordinates": coords,
        "ccindex_parquet": coords_path,
    }
