"""Real image codec (BMP/PPM) + the real decode/resize path of the
multimodal stages: round-trip identity, numpy resize oracle, honest
rejection of malformed/unsupported payloads, and the Ray actor-pool
pipeline over real payloads end to end."""

from __future__ import annotations

import numpy as np
import pytest

from temporal_knowledge_graphs_ray.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_image,
    encode_ppm,
    resize_nearest,
    sniff_format,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestCodecs:
    @pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 5), (16, 16),
                                     (33, 31), (240, 320), (3, 101)])
    def test_bmp_roundtrip_incl_row_padding(self, h, w):
        # widths not divisible by 4 exercise the stride padding
        img = _img(h, w, seed=h * 1000 + w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    @pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 5), (240, 320)])
    def test_ppm_roundtrip(self, h, w):
        img = _img(h, w, seed=h * 1000 + w)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_bmp_top_down_variant(self):
        img = _img(4, 6, seed=1)
        payload = bytearray(encode_bmp(img))
        # flip to top-down: negate height, reorder rows accordingly
        import struct

        h = struct.unpack_from("<i", payload, 22)[0]
        struct.pack_into("<i", payload, 22, -h)
        offset = struct.unpack_from("<I", payload, 10)[0]
        stride = (6 * 3 + 3) & ~3
        rows = [bytes(payload[offset + i * stride:offset + (i + 1) * stride])
                for i in range(h)]
        payload[offset:] = b"".join(reversed(rows))
        assert np.array_equal(decode_bmp(bytes(payload)), img)

    def test_ppm_header_comments_and_whitespace(self):
        img = _img(2, 2, seed=2)
        body = np.ascontiguousarray(img).tobytes()
        payload = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + body
        assert np.array_equal(decode_ppm(payload), img)

    def test_rejects_malformed(self):
        img = _img(3, 3)
        with pytest.raises(ValueError):
            decode_bmp(encode_bmp(img)[:-5])  # truncated pixels
        with pytest.raises(ValueError):
            decode_ppm(encode_ppm(img)[:-5])
        with pytest.raises(ValueError):
            decode_image(b"\x89PNG\r\n\x1a\n not supported")
        # 8-bit BMP (unsupported bpp) must be refused, not misread
        bad = bytearray(encode_bmp(img))
        import struct

        struct.pack_into("<H", bad, 28, 8)
        with pytest.raises(ValueError):
            decode_bmp(bytes(bad))

    def test_sniff(self):
        img = _img(2, 2)
        assert sniff_format(encode_bmp(img)) == "bmp"
        assert sniff_format(encode_ppm(img)) == "ppm"
        assert sniff_format(b"GIF89a...") is None

    def test_resize_nearest_matches_numpy_oracle(self):
        img = _img(30, 40, seed=3)
        out = resize_nearest(img, 13, 7)
        # oracle: explicit per-pixel sample-grid lookup
        oracle = np.empty((7, 13, 3), np.uint8)
        for y in range(7):
            for x in range(13):
                sy = min(int((y + 0.5) * 30 / 7), 29)
                sx = min(int((x + 0.5) * 40 / 13), 39)
                oracle[y, x] = img[sy, sx]
        assert np.array_equal(out, oracle)

    def test_resize_identity_and_upscale(self):
        img = _img(5, 8, seed=4)
        assert np.array_equal(resize_nearest(img, 8, 5), img)
        up = resize_nearest(img, 16, 10)
        assert up.shape == (10, 16, 3)


@pytest.mark.usefixtures("ray_session")
class TestRealMediaPipeline:
    def test_decode_resize_real_payloads_end_to_end(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.multimodal import (
            decode_media,
            resize_media,
            synth_image_table,
        )

        media = synth_image_table(24, seed=11)
        ds = rd.from_arrow(media)
        # REAL decode: fake=False must succeed on BMP/PPM payloads
        decoded = decode_media(ds, fake=False).to_pandas().sort_values(
            "media_id", ignore_index=True)
        assert len(decoded) == 24
        for i in range(24):
            img, _ = decode_image(media["payload"][i].as_py())
            assert decoded["width"][i] == img.shape[1]
            assert decoded["height"][i] == img.shape[0]
            assert decoded["channels"][i] == 3

        # REAL resize: every output payload re-decodes at the target box
        resized = resize_media(ds, max_side=64, fake=False).to_pandas(
        ).sort_values("media_id", ignore_index=True)
        for i in range(24):
            img, fmt_in = decode_image(media["payload"][i].as_py())
            out_img, fmt_out = decode_image(resized["payload"][i])
            assert fmt_out == fmt_in  # same container format back
            h, w = img.shape[:2]
            scale = min(1.0, 64 / max(w, h))
            assert out_img.shape == (max(1, int(h * scale)),
                                     max(1, int(w * scale)), 3)
            assert int(resized["width"][i]) == out_img.shape[1]
            assert int(resized["height"][i]) == out_img.shape[0]
            # pixel-level: equals the nearest-neighbor kernel output
            expect = (img if scale == 1.0 else resize_nearest(
                img, out_img.shape[1], out_img.shape[0]))
            assert np.array_equal(out_img, expect)

    def test_non_decodable_still_gated(self):
        import ray.data as rd
        import pyarrow as pa

        from temporal_knowledge_graphs_ray.stages.multimodal import (
            MEDIA_SCHEMA,
            decode_media,
        )

        tbl = pa.Table.from_arrays(
            [pa.array([0], pa.int64()),
             pa.array([b"\xff\xd8\xffJPEGISH"], pa.binary()),
             pa.array(["image"], pa.string()),
             pa.array([8], pa.int64())], schema=MEDIA_SCHEMA)
        with pytest.raises(Exception):  # NotImplementedError via Ray task
            decode_media(rd.from_arrow(tbl), fake=False).to_pandas()
        # fake mode still handles it (deterministic stand-in)
        out = decode_media(rd.from_arrow(tbl), fake=True).to_pandas()
        assert len(out) == 1


@pytest.mark.usefixtures("ray_session")
class TestFakeModeSniffCollision:
    def test_text_payload_sniffing_like_image_falls_back_in_fake_mode(self):
        """Regression: document text starting 'BM'/'P6' sniffs like an
        image; fake mode must fall back to the deterministic stand-in,
        not crash in the strict codec. Strict mode must stay loud."""
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.multimodal import (
            MEDIA_SCHEMA,
            decode_media,
            resize_media,
        )

        payloads = [b"BMW announced record sales in Q3 2021.",
                    b"P6 is a bus route in Berlin."]
        tbl = pa.Table.from_arrays(
            [pa.array([0, 1], pa.int64()),
             pa.array(payloads, pa.binary()),
             pa.array(["image", "image"], pa.string()),
             pa.array([len(p) for p in payloads], pa.int64())],
            schema=MEDIA_SCHEMA)
        out = decode_media(rd.from_arrow(tbl), fake=True).to_pandas()
        assert len(out) == 2  # deterministic stand-in dims, no crash
        rs = resize_media(rd.from_arrow(tbl), fake=True).to_pandas()
        assert len(rs) == 2
        with pytest.raises(Exception):
            decode_media(rd.from_arrow(tbl), fake=False).to_pandas()


class TestPng:
    """Pure zlib+numpy PNG: round-trip, every filter type, every
    supported color type, loud gates outside the subset."""

    def _rand(self, h, w, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def test_roundtrip_rgb(self):
        from temporal_knowledge_graphs_ray.functions.imagecodec import (
            decode_png,
            encode_png,
        )

        img = self._rand(13, 7)
        out = decode_png(encode_png(img))
        np.testing.assert_array_equal(out, img)

    def test_sniff_and_decode_image_dispatch(self):
        from temporal_knowledge_graphs_ray.functions.imagecodec import (
            decode_image,
            encode_png,
            sniff_format,
        )

        img = self._rand(4, 5, seed=3)
        payload = encode_png(img)
        assert sniff_format(payload) == "png"
        got, fmt = decode_image(payload)
        assert fmt == "png"
        np.testing.assert_array_equal(got, img)

    def _build_png(self, scanlines: bytes, w, h, ctype, plte=None):
        import struct
        import zlib

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        out = b"\x89PNG\r\n\x1a\n" + chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(scanlines)) \
            + chunk(b"IEND", b"")

    def test_all_filter_types_reverse(self):
        # forward-filter a known image with each filter per row, then
        # assert the decoder reconstructs the original pixels
        from temporal_knowledge_graphs_ray.functions.imagecodec import (
            decode_png,
        )

        img = self._rand(5, 6, seed=9).astype(np.int64)
        h, w = 5, 6
        bpp = 3
        flat = img.reshape(h, w * bpp)
        lines = bytearray()
        prev = np.zeros(w * bpp, dtype=np.int64)
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            cur = flat[y]
            if ftype == 0:
                enc = cur
            elif ftype == 1:
                left = np.concatenate([np.zeros(bpp, np.int64),
                                       cur[:-bpp]])
                enc = (cur - left) % 256
            elif ftype == 2:
                enc = (cur - prev) % 256
            elif ftype == 3:
                left = np.concatenate([np.zeros(bpp, np.int64),
                                       cur[:-bpp]])
                enc = (cur - (left + prev) // 2) % 256
            else:  # Paeth
                enc = np.zeros(w * bpp, dtype=np.int64)
                for x in range(w * bpp):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pcc) else \
                        (b if pb <= pcc else c)
                    enc[x] = (cur[x] - pred) % 256
            lines.append(ftype)
            lines.extend(int(v) for v in enc)
            prev = cur
        got = decode_png(self._build_png(bytes(lines), w, h, 2))
        np.testing.assert_array_equal(got, img.astype(np.uint8))

    def test_gray_rgba_palette_types(self):
        from temporal_knowledge_graphs_ray.functions.imagecodec import (
            decode_png,
        )

        # gray (type 0): value replicated to RGB
        gray = bytes([0, 10, 20, 0, 30, 40])  # 2 rows of 2 px
        out = decode_png(self._build_png(gray, 2, 2, 0))
        np.testing.assert_array_equal(out[0, 0], [10, 10, 10])
        np.testing.assert_array_equal(out[1, 1], [40, 40, 40])
        # RGBA (type 6): alpha dropped
        rgba = bytes([0, 1, 2, 3, 255, 4, 5, 6, 0])
        out = decode_png(self._build_png(rgba, 2, 1, 6))
        np.testing.assert_array_equal(out[0, 0], [1, 2, 3])
        np.testing.assert_array_equal(out[0, 1], [4, 5, 6])
        # gray+alpha (type 4)
        ga = bytes([0, 77, 200, 99, 10])
        out = decode_png(self._build_png(ga, 2, 1, 4))
        np.testing.assert_array_equal(out[0, 0], [77, 77, 77])
        # palette (type 3)
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        idx = bytes([0, 2, 1, 0])  # filter byte + pixels [2, 1, 0], w=3
        out = decode_png(self._build_png(idx, 3, 1, 3, plte=plte))
        np.testing.assert_array_equal(out[0, 0], [0, 0, 255])   # pal[2]
        np.testing.assert_array_equal(out[0, 1], [0, 255, 0])   # pal[1]
        np.testing.assert_array_equal(out[0, 2], [255, 0, 0])   # pal[0]

    def test_rejects_outside_subset(self):
        import struct
        import zlib

        from temporal_knowledge_graphs_ray.functions.imagecodec import (
            decode_png,
            encode_png,
        )

        with pytest.raises(ValueError):
            decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage")
        # 16-bit depth refused loudly
        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
        p16 = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(7)))
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            decode_png(p16)
        # truncated pixel data
        img = np.zeros((2, 2, 3), np.uint8)
        good = encode_png(img)
        with pytest.raises(Exception):
            decode_png(good[:-20])

    @pytest.mark.usefixtures("ray_session")
    def test_png_flows_through_decode_stage(self):
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.functions.imagecodec import (
            encode_png,
        )
        from temporal_knowledge_graphs_ray.stages.multimodal import (
            decode_media,
        )

        img = self._rand(8, 12, seed=5)
        tbl = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image"], pa.string()),
            "payload": pa.array([encode_png(img)], pa.binary()),
        })
        out = decode_media(rd.from_arrow(tbl), fake=False).to_pandas()
        assert (int(out.iloc[0]["width"]), int(out.iloc[0]["height"]),
                int(out.iloc[0]["channels"])) == (12, 8, 3)


def test_mutation_fuzz_exception_contract():
    """Corrupted/truncated image payloads must raise only ValueError /
    NotImplementedError — never zlib.error / struct.error / IndexError —
    because DecodeStage's strict-mode policy and the fake-fallback both
    key on those two types. Seeded mutations over all three codecs."""
    import random

    from temporal_knowledge_graphs_ray.functions import imagecodec

    rng = random.Random(20260820)
    arr = np.arange(10 * 10 * 3, dtype=np.uint8).reshape(10, 10, 3)
    cases = [
        (imagecodec.encode_png(arr), imagecodec.decode_png),
        (imagecodec.encode_bmp(arr), imagecodec.decode_bmp),
        (imagecodec.encode_ppm(arr), imagecodec.decode_ppm),
    ]
    for base, fn in cases:
        for _ in range(1500):
            b = bytearray(base)
            for _m in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            blob = bytes(b)[: rng.randrange(2, len(b) + 1)]
            try:
                fn(blob)
            except (ValueError, NotImplementedError):
                pass  # the decode contract
