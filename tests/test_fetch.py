"""Egress-gated dataset fetchers (data/fetch.py) — offline, via the
injectable transport.

Reference semantics under test: Karpathy zip download/extract with cached
reuse (json_creation/karpathy_download.py:30-55) and the Conceptual
Captions live fetch — header skip, URL-derived filenames, PIL validation,
failure skip, 5x row-oversampling cap, on-disk reuse
(json_creation/big_teacher_data.py:228-350).
"""
import io
import json
import os
import zipfile

import pytest

from dclip_tpu.data.fetch import (
    NetworkDisabled,
    cc_image_filename,
    download_karpathy_split,
    fetch_conceptual_captions,
)


def _png_bytes(color=(10, 200, 30)):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), color).save(buf, "PNG")
    return buf.getvalue()


class FakeTransport:
    """url -> bytes | Exception; records every request."""

    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, url, timeout):
        self.calls.append(url)
        r = self.responses[url]
        if isinstance(r, Exception):
            raise r
        return r


def _karpathy_zip_bytes(dataset="flickr30k", n=3, split="test"):
    images = [
        {
            "filename": f"img_{i}.jpg",
            "imgid": i,
            "split": split,
            "sentences": [{"raw": f"caption {i}a"}, {"raw": f"caption {i}b"}],
        }
        for i in range(n)
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            f"{dataset}/dataset_{dataset}.json", json.dumps({"images": images})
        )
    return buf.getvalue()


def test_karpathy_download_gated_cached_and_extracted(tmp_path, capsys):
    data_dir = str(tmp_path / "karpathy")
    url = "https://cs.stanford.edu/people/karpathy/deepimagesent/flickr30k.zip"
    t = FakeTransport({url: _karpathy_zip_bytes()})

    # Gate: no network flag -> actionable error naming the url + zip path.
    with pytest.raises(NetworkDisabled) as e:
        download_karpathy_split("flickr30k", data_dir, allow_network=False)
    assert url in str(e.value) and "--allow_network" in str(e.value)

    jp = download_karpathy_split(
        "flickr30k", data_dir, allow_network=True, transport=t
    )
    assert os.path.exists(jp) and t.calls == [url]
    with open(jp) as f:
        assert len(json.load(f)["images"]) == 3

    # Extracted json present -> neither download nor extract re-runs.
    jp2 = download_karpathy_split(
        "flickr30k", data_dir, allow_network=True, transport=t
    )
    assert jp2 == jp and t.calls == [url]
    assert "already extracted" in capsys.readouterr().out

    # Zip cached, json removed -> re-extract WITHOUT a network touch
    # (reference :30-46 skip logic), even with networking disabled.
    os.remove(jp)
    jp3 = download_karpathy_split("flickr30k", data_dir, allow_network=False)
    assert os.path.exists(jp3) and t.calls == [url]

    with pytest.raises(ValueError):
        download_karpathy_split("imagenet", data_dir)


def test_karpathy_cli_download_end_to_end(tmp_path, monkeypatch):
    """cli.karpathy --download --allow_network drives fetch -> extract ->
    split JSON with the reference's output schema."""
    from dclip_tpu.cli import karpathy as cli
    from dclip_tpu.data import fetch as fetch_mod

    url = "https://cs.stanford.edu/people/karpathy/deepimagesent/flickr30k.zip"
    t = FakeTransport({url: _karpathy_zip_bytes(n=2)})
    monkeypatch.setattr(fetch_mod, "default_transport", t)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        (img_dir / f"img_{i}.jpg").write_bytes(_png_bytes())
    out_dir = tmp_path / "out"
    rc = cli.main([
        "--datasets", "flickr30k", "--download", "--allow_network",
        "--data_dir", str(tmp_path / "kcache"),
        "--flickr_dir", str(img_dir),
        "--output_dir", str(out_dir), "--split", "test",
    ])
    assert rc == 0 and t.calls == [url]
    with open(out_dir / "flickr30k_test.json") as f:
        items = json.load(f)
    assert len(items) == 2
    assert set(items[0]) == {"image_path", "image_id", "captions"}

    # Without --allow_network the same command fails loudly.
    with pytest.raises(NetworkDisabled):
        cli.main([
            "--datasets", "flickr30k", "--download",
            "--data_dir", str(tmp_path / "kcache2"),
            "--flickr_dir", str(img_dir), "--output_dir", str(out_dir),
        ])


def _cc_tsv(tmp_path, rows):
    p = tmp_path / "cc.tsv"
    p.write_text("\n".join(rows) + "\n", encoding="utf-8")
    return str(p)


def test_cc_fetch_reference_semantics(tmp_path):
    img_dir = str(tmp_path / "cc_images")
    good = "http://a.example/photo.jpg?sz=big"
    bad_body = "http://b.example/not_an_image.jpg"
    unreachable = "http://c.example/timeout.jpg"
    good2 = "http://d.example/second one!.png"  # chars needing cleanup
    tsv = _cc_tsv(tmp_path, [
        "caption\turl",  # header: skipped (reference :268-269)
        f"a dog\t{good}",
        f"a cat\t{bad_body}",
        f"a bird\t{unreachable}",
        "short-row-no-tab",
        f"\t{good}",  # empty caption: skipped
        f"a fish\t{good2}",
    ])
    t = FakeTransport({
        good: _png_bytes(),
        bad_body: b"<html>404</html>",
        unreachable: OSError("timeout"),
        good2: _png_bytes((200, 10, 10)),
    })

    with pytest.raises(NetworkDisabled):
        fetch_conceptual_captions(img_dir, tsv, 5, allow_network=False)

    recs = fetch_conceptual_captions(
        img_dir, tsv, target_count=5, allow_network=True, transport=t
    )
    assert [r["captions"] for r in recs] == [["a dog"], ["a fish"]]
    assert all(
        r["dataset"] == "conceptual_captions" and r["boxes"] == []
        for r in recs
    )
    # URL-derived naming, query stripped, invalid chars removed
    # (reference :280-289).
    assert os.path.basename(recs[0]["image_path"]) == "cc_0000001_photo.jpg"
    assert os.path.basename(recs[1]["image_path"]) == "cc_0000006_secondone.png"
    assert all(os.path.exists(r["image_path"]) for r in recs)

    # Re-fetch: valid on-disk images are reused with ZERO network calls
    # for THEM (reference :292-307); previously FAILED urls are retried
    # (no file on disk), also faithful.
    good_calls_before = t.calls.count(good) + t.calls.count(good2)
    recs2 = fetch_conceptual_captions(
        img_dir, tsv, target_count=2, allow_network=True, transport=t
    )
    assert [r["image_path"] for r in recs2] == [r["image_path"] for r in recs]
    assert t.calls.count(good) + t.calls.count(good2) == good_calls_before

    # An existing-but-corrupt file is re-downloaded (reference :303-307).
    with open(recs[0]["image_path"], "wb") as f:
        f.write(b"corrupt")
    fetch_conceptual_captions(
        img_dir, tsv, target_count=1, allow_network=True, transport=t
    )
    assert t.calls[-1] == good
    from dclip_tpu.data.fetch import _valid_image

    assert _valid_image(recs[0]["image_path"])


def test_cc_fetch_oversampling_cap(tmp_path):
    """The reference scans at most target*5 rows (big_teacher_data.py:263)
    and therefore UNDERSHOOTS when failures exceed 80% — reproduced
    faithfully; max_scan_rows overrides."""
    n = 30
    urls = [f"http://x.example/{i}.jpg" for i in range(n)]
    tsv = _cc_tsv(tmp_path, [f"cap {i}\t{urls[i]}" for i in range(n)])
    # Every URL fails except the last one — outside the 2*5=10-row cap.
    t = FakeTransport({u: OSError("down") for u in urls[:-1]}
                      | {urls[-1]: _png_bytes()})
    recs = fetch_conceptual_captions(
        str(tmp_path / "i1"), tsv, target_count=2, allow_network=True,
        transport=t,
    )
    assert recs == [] and len(t.calls) == 10  # cap honored, undershoot
    # Explicit max_scan_rows reaches the good row.
    recs = fetch_conceptual_captions(
        str(tmp_path / "i2"), tsv, target_count=2, allow_network=True,
        transport=t, max_scan_rows=n,
    )
    assert len(recs) == 1


def test_cc_filename_fallback():
    assert cc_image_filename(3, "http://x.example/") == "cc_0000003.jpg"
    assert cc_image_filename(3, "http://x.example/a b#.png") == "cc_0000003_ab.png"


def test_combine_datasets_allow_network_then_offline(tmp_path):
    """combine_datasets with allow_network live-fetches CC through the
    injected transport; a later OFFLINE rebuild finds the same fetched
    images via the URL-derived filename candidate in
    process_conceptual_captions."""
    from dclip_tpu.data.corpus import (
        CorpusPaths,
        combine_datasets,
        process_conceptual_captions,
    )

    good = ["http://h.example/a.jpg", "http://h.example/b.jpg"]
    tsv = _cc_tsv(tmp_path, [f"cap {i}\t{u}" for i, u in enumerate(good)])
    t = FakeTransport({u: _png_bytes() for u in good})
    img_dir = str(tmp_path / "cc")
    paths = CorpusPaths(
        cc_images_dir=img_dir, cc_annotations_file=tsv,
        allow_network=True, cc_transport=t,
        targets={"conceptual_captions": 2},
    )
    train, val = combine_datasets(
        paths, str(tmp_path / "train.json"), str(tmp_path / "val.json"),
        val_fraction=0.5,
    )
    with open(train) as f:
        items = json.load(f) + json.load(open(val))
    assert len(items) == 2 and len(t.calls) == 2
    assert all(i["dataset"] == "conceptual_captions" for i in items)

    # Offline rescan (no network) picks up the fetched files by name.
    offline = process_conceptual_captions(img_dir, tsv, 2)
    assert sorted(r["image_path"] for r in offline) == sorted(
        i["image_path"] for i in items
    )
