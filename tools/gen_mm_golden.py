"""Regenerate pixels_spark/queries/_mm_golden.py — the golden-value SQL
oracles for the mm_decode / mm_video_pipeline queries (VERDICT r9 task
#6). The decoders are deterministic, so their full result sets pin as
literal VALUES that DuckDB replays; run this whenever the synthetic
media fixture or a codec changes:

    python tools/gen_mm_golden.py
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

COLS = [
    ("media_id", "BIGINT"), ("kind", "VARCHAR"), ("n_bytes", "BIGINT"),
    ("width", "BIGINT"), ("height", "BIGINT"), ("sample_rate", "BIGINT"),
    ("duration_s", "DOUBLE"), ("n_frames", "BIGINT"), ("err", "VARCHAR"),
]

MP4_COLS = [
    ("media_id", "BIGINT"), ("brand", "VARCHAR"), ("codec", "VARCHAR"),
    ("handler", "VARCHAR"), ("timescale", "BIGINT"), ("n_frames", "BIGINT"),
    ("duration_s", "DOUBLE"), ("width", "BIGINT"), ("height", "BIGINT"),
    ("n_chunks", "BIGINT"), ("first_frame_off", "BIGINT"),
    ("last_frame_end", "BIGINT"), ("frame_bytes", "BIGINT"),
    ("n_tracks", "BIGINT"), ("first_pts_s", "DOUBLE"),
    ("audio_codec", "VARCHAR"), ("audio_timescale", "BIGINT"),
    ("audio_n_frames", "BIGINT"),
    ("err", "VARCHAR"),
]

MP3_COLS = [
    ("media_id", "BIGINT"), ("version", "VARCHAR"), ("layer", "BIGINT"),
    ("sample_rate", "BIGINT"), ("channels", "BIGINT"),
    ("n_frames", "BIGINT"), ("n_samples", "BIGINT"),
    ("duration_s", "DOUBLE"), ("mean_kbps", "DOUBLE"),
    ("is_vbr", "BOOLEAN"), ("xing_frames", "BIGINT"),
    ("id3v2_bytes", "BIGINT"), ("first_frame_off", "BIGINT"),
    ("last_frame_end", "BIGINT"), ("err", "VARCHAR"),
]

GIF_COLS = [
    ("media_id", "BIGINT"), ("version", "VARCHAR"), ("width", "BIGINT"),
    ("height", "BIGINT"), ("n_colors", "BIGINT"), ("n_frames", "BIGINT"),
    ("n_interlaced", "BIGINT"), ("duration_s", "DOUBLE"),
    ("loop_count", "BIGINT"), ("has_transparency", "BOOLEAN"),
    ("has_comment", "BOOLEAN"), ("n_pixels", "BIGINT"),
    ("pixel_checksum", "BIGINT"), ("mean_index", "DOUBLE"),
    ("err", "VARCHAR"),
]

ARCH_COLS = [
    ("media_id", "BIGINT"), ("fmt", "VARCHAR"), ("member_name", "VARCHAR"),
    ("method", "VARCHAR"), ("data_offset", "BIGINT"), ("comp_size", "BIGINT"),
    ("uncomp_size", "BIGINT"), ("crc_ok", "BOOLEAN"),
    ("content_checksum", "BIGINT"), ("err", "VARCHAR"),
]

WARC_COLS = [
    ("media_id", "BIGINT"), ("rec_type", "VARCHAR"), ("uri", "VARCHAR"),
    ("record_id", "VARCHAR"), ("content_length", "BIGINT"),
    ("content_type", "VARCHAR"), ("http_status", "BIGINT"),
    ("body_bytes", "BIGINT"), ("body_checksum", "BIGINT"),
    ("gzip_member", "BOOLEAN"), ("err", "VARCHAR"),
]

PDF_COLS = [
    ("media_id", "BIGINT"), ("version", "VARCHAR"),
    ("n_objects", "BIGINT"), ("n_pages", "BIGINT"),
    ("encrypted", "BOOLEAN"), ("title", "VARCHAR"),
    ("author", "VARCHAR"), ("producer", "VARCHAR"),
    ("text_chars", "BIGINT"), ("text_checksum", "BIGINT"),
    ("err", "VARCHAR"),
]

MKV_COLS = [
    ("media_id", "BIGINT"), ("doc_type", "VARCHAR"), ("ts_scale", "BIGINT"),
    ("duration_s", "DOUBLE"), ("n_tracks", "BIGINT"),
    ("video_codec", "VARCHAR"), ("width", "BIGINT"), ("height", "BIGINT"),
    ("audio_codec", "VARCHAR"), ("audio_rate", "DOUBLE"),
    ("audio_channels", "BIGINT"), ("n_clusters", "BIGINT"),
    ("n_blocks", "BIGINT"), ("n_video_frames", "BIGINT"),
    ("first_frame_off", "BIGINT"), ("last_frame_end", "BIGINT"),
    ("frame_bytes", "BIGINT"), ("err", "VARCHAR"),
]

WEBP_COLS = [
    ("media_id", "BIGINT"), ("variant", "VARCHAR"), ("width", "BIGINT"),
    ("height", "BIGINT"), ("has_alpha", "BOOLEAN"),
    ("has_animation", "BOOLEAN"), ("has_icc", "BOOLEAN"),
    ("has_exif", "BOOLEAN"), ("has_xmp", "BOOLEAN"),
    ("n_frames", "BIGINT"), ("duration_s", "DOUBLE"),
    ("n_chunks", "BIGINT"), ("err", "VARCHAR"),
]

TIFF_COLS = [
    ("media_id", "BIGINT"), ("byte_order", "VARCHAR"),
    ("n_pages", "BIGINT"), ("width", "BIGINT"), ("height", "BIGINT"),
    ("bits_per_sample", "BIGINT"), ("samples_per_pixel", "BIGINT"),
    ("compression", "BIGINT"), ("photometric", "BIGINT"),
    ("predictor", "BIGINT"), ("n_strips", "BIGINT"),
    ("strip_bytes", "BIGINT"), ("decoded_pages", "BIGINT"),
    ("n_pixels", "BIGINT"), ("pixel_checksum", "BIGINT"),
    ("mean_byte", "DOUBLE"), ("err", "VARCHAR"),
]

BMP_COLS = [
    ("media_id", "BIGINT"), ("width", "BIGINT"), ("height", "BIGINT"),
    ("bpp", "BIGINT"), ("compression", "BIGINT"), ("n_colors", "BIGINT"),
    ("top_down", "BOOLEAN"), ("n_pixels", "BIGINT"),
    ("pixel_checksum", "BIGINT"), ("mean_byte", "DOUBLE"),
    ("err", "VARCHAR"),
]

AVI_COLS = [
    ("media_id", "BIGINT"), ("width", "BIGINT"), ("height", "BIGINT"),
    ("n_streams", "BIGINT"), ("n_frames", "BIGINT"), ("fps", "DOUBLE"),
    ("duration_s", "DOUBLE"), ("video_codec", "VARCHAR"),
    ("audio_tag", "BIGINT"), ("audio_channels", "BIGINT"),
    ("audio_rate", "BIGINT"), ("n_chunks", "BIGINT"),
    ("idx1_entries", "BIGINT"), ("first_frame_off", "BIGINT"),
    ("last_frame_end", "BIGINT"), ("frame_bytes", "BIGINT"),
    ("err", "VARCHAR"),
]

OGG_COLS = [
    ("media_id", "BIGINT"), ("codec", "VARCHAR"), ("channels", "BIGINT"),
    ("sample_rate", "BIGINT"), ("pre_skip", "BIGINT"),
    ("n_pages", "BIGINT"), ("n_packets", "BIGINT"),
    ("n_streams", "BIGINT"), ("last_granule", "BIGINT"),
    ("duration_s", "DOUBLE"), ("eos", "BOOLEAN"), ("err", "VARCHAR"),
]


def _lit(v, typ):
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "DOUBLE":
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({v} AS {typ})"


def _values_sql(rows, cols=COLS) -> str:
    lines = [
        "  (" + ", ".join(_lit(getattr(r, c), t) for c, t in cols) + ")"
        for r in rows
    ]
    colnames = ", ".join(c for c, _ in cols)
    return (
        f"SELECT {colnames}\nFROM (VALUES\n" + ",\n".join(lines)
        + f"\n) AS t({colnames})\nORDER BY media_id\n"
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from pixels_spark.functions import mp4 as MP
    from pixels_spark.functions import multimodal as M

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gen-mm-golden")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    media = M.synthetic_media(spark, n=64)
    decode_rows = M.media_features(media).orderBy("media_id").collect()
    frames = M.explode_video_frames(media, every_n=2)
    video_rows = (
        M.media_features(M.resize_images(frames, 2))
        .orderBy("media_id")
        .collect()
    )
    mp4_rows = (
        MP.mp4_meta(MP.synthetic_mp4_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import mp3 as M3
    from pixels_spark.functions import ogg as OG

    mp3_rows = (
        M3.mp3_meta(M3.synthetic_mp3_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    ogg_rows = (
        OG.ogg_meta(OG.synthetic_ogg_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import gif as GF

    gif_rows = (
        GF.gif_meta(GF.synthetic_gif_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import avi as AV

    avi_rows = (
        AV.avi_meta(AV.synthetic_avi_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import bmp as BM

    bmp_rows = (
        BM.bmp_meta(BM.synthetic_bmp_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import tiff as TF

    tiff_rows = (
        TF.tiff_meta(TF.synthetic_tiff_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import warc as WC

    warc_rows = (
        WC.warc_records(WC.synthetic_warc_media(spark, n=12))
        .orderBy("media_id", "record_id")
        .collect()
    )
    from pixels_spark.functions import pdf as PD

    pdf_rows = (
        PD.pdf_meta(PD.synthetic_pdf_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import mkv as MK

    mkv_rows = (
        MK.mkv_meta(MK.synthetic_mkv_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import webp as WP

    webp_rows = (
        WP.webp_meta(WP.synthetic_webp_media(spark, n=12))
        .orderBy("media_id")
        .collect()
    )
    from pixels_spark.functions import archive as AR

    arch_rows = (
        AR.archive_manifest(AR.synthetic_archive_media(spark, n=12))
        .orderBy("media_id", "member_name")
        .collect()
    )
    spark.stop()

    out = os.path.join(_ROOT, "pixels_spark", "queries", "_mm_golden.py")
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_mm_golden.py — do not edit by hand.\n'
            "\n"
            "Golden-value SQL oracles for the deterministic multimodal decode\n"
            "queries: DuckDB cannot decode JPEG/PNG/WAV/FLAC/PVID bytes, but\n"
            "the pure-Python codecs are deterministic, so the exact result\n"
            "sets pin as literal VALUES — turning the former rows-only checks\n"
            "into full value/hash oracle compares. Regenerate after any\n"
            "fixture or codec change.\n"
            '"""\n\n'
            f"MM_DECODE_SQL = '''\n{_values_sql(decode_rows)}'''\n\n"
            f"MM_VIDEO_SQL = '''\n{_values_sql(video_rows)}'''\n\n"
            f"MM_MP4_SQL = '''\n{_values_sql(mp4_rows, MP4_COLS)}'''\n\n"
            f"MM_MP3_SQL = '''\n{_values_sql(mp3_rows, MP3_COLS)}'''\n\n"
            f"MM_OGG_SQL = '''\n{_values_sql(ogg_rows, OGG_COLS)}'''\n\n"
            f"MM_GIF_SQL = '''\n{_values_sql(gif_rows, GIF_COLS)}'''\n\n"
            f"MM_AVI_SQL = '''\n{_values_sql(avi_rows, AVI_COLS)}'''\n\n"
            f"MM_BMP_SQL = '''\n{_values_sql(bmp_rows, BMP_COLS)}'''\n\n"
            f"MM_TIFF_SQL = '''\n{_values_sql(tiff_rows, TIFF_COLS)}'''\n\n"
            f"MM_PDF_SQL = '''\n{_values_sql(pdf_rows, PDF_COLS)}'''\n\n"
            f"MM_WARC_SQL = '''\n{_values_sql(warc_rows, WARC_COLS)}'''\n\n"
            f"MM_MKV_SQL = '''\n{_values_sql(mkv_rows, MKV_COLS)}'''\n\n"
            f"MM_WEBP_SQL = '''\n{_values_sql(webp_rows, WEBP_COLS)}'''\n\n"
            f"MM_ARCH_SQL = '''\n{_values_sql(arch_rows, ARCH_COLS)}'''\n"
        )
    print(
        f"wrote {out}: {len(decode_rows)} + {len(video_rows)} + "
        f"{len(mp4_rows)} + {len(mp3_rows)} + {len(ogg_rows)} + "
        f"{len(gif_rows)} + {len(avi_rows)} + {len(bmp_rows)} + "
        f"{len(tiff_rows)} + {len(pdf_rows)} + {len(warc_rows)} + "
        f"{len(mkv_rows)} + {len(webp_rows)} + {len(arch_rows)} golden rows"
    )


if __name__ == "__main__":
    main()
