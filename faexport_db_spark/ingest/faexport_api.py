"""FAExport web-push format adapters (reference:
faexport_db/ingest_formats/faexport.py) — the POST /api/ingest/<format>
payload conversions (S7), expressed over a DataFrame of raw JSON
payload strings so the same code serves batch replays and the
micro-batch streaming ingest (streaming/ingest_stream.py).

The user-format flat-map is the reference's widest fan-out: one payload
yields the user snapshot + up to ~20 watcher/watching stub snapshots +
up to 2 featured submissions (faexport.py:74-152) — here an explode of
the watcher arrays plus unions (U3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faexport_db_spark.functions.scalars import id_from_url
from faexport_db_spark.ingest.base import ordered_keywords

SUBMISSION_PAYLOAD_SCHEMA = (
    "struct<error:string, link:string, profile_name:string, name:string, "
    "title:string, description:string, posted_at:string, rating:string, "
    "category:string, theme:string, species:string, gender:string, "
    "favorites:bigint, comments:bigint, views:bigint, download:string, "
    "thumbnail:string, full:string, resolution:string, avatar:string, "
    "keywords:array<string>>"
)

USER_PAYLOAD_SCHEMA = (
    "struct<error:string, url:string, profile:string, name:string, "
    "account_type:string, avatar:string, user_title:string, registered_at:string, "
    "guest_access:boolean, current_mood:string, artist_profile:string, "
    "pageviews:bigint, submissions:bigint, comments_received:bigint, "
    "comments_given:bigint, journals:bigint, favorites:bigint, "
    "featured_submission:struct<id:string,title:string,thumbnail:string>, "
    "profile_id:struct<id:string,title:string,thumbnail:string>, "
    "artist_information:map<string,string>, "
    "contact_information:array<struct<title:string,name:string,link:string>>, "
    "watchers:struct<count:bigint, recent:array<struct<profile_name:string,name:string>>>, "
    "watching:struct<count:bigint, recent:array<struct<profile_name:string,name:string>>>>"
)

FA_SITE_ID = "fa"


def parse_submission_payloads(payloads: DataFrame, payload_col: str = "payload") -> DataFrame:
    return payloads.select(
        F.from_json(payload_col, SUBMISSION_PAYLOAD_SCHEMA).alias("p")
    )


def submission_snapshots(
    parsed: DataFrame, contributor_id: int, scan_time=None
) -> DataFrame:
    """faexport.py:18-68: error payloads skipped; submission id from the
    link URL (C1); file carries thumbnail/preview/resolution extra."""
    rows = parsed.filter(F.col("p.error").isNull())
    scan = F.lit(scan_time).cast("timestamp") if scan_time else F.current_timestamp()
    res = F.split(F.col("p.resolution"), "x")
    file_struct = F.struct(
        F.lit(None).cast("string").alias("site_file_id"),
        F.col("p.download").alias("file_url"),
        F.lit(None).cast("bigint").alias("file_size"),
        F.to_json(
            F.struct(
                F.col("p.thumbnail").alias("thumbnail_url"),
                F.col("p.full").alias("full_preview_url"),
                F.when(F.col("p.resolution").isNotNull(), res.getItem(0)).alias("image_width"),
                F.when(F.col("p.resolution").isNotNull(), res.getItem(1)).alias("image_height"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("extra_data"),
        F.lit([]).cast("array<struct<algo_id:bigint,hash_value:binary>>").alias("hashes"),
    )
    return rows.select(
        F.lit(FA_SITE_ID).alias("website_id"),
        id_from_url(F.col("p.link")).alias("site_submission_id"),
        scan.alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.col("p.profile_name").alias("uploader_site_user_id"),
        F.lit(False).alias("is_deleted"),
        F.col("p.title").alias("title"),
        F.col("p.description").alias("description"),
        F.try_to_timestamp(F.col("p.posted_at")).alias("datetime_posted"),
        F.to_json(
            F.struct(
                F.col("p.rating").alias("rating"),
                F.col("p.category").alias("category"),
                F.col("p.theme").alias("theme"),
                F.col("p.species").alias("species"),
                F.col("p.gender").alias("gender"),
                F.col("p.favorites").alias("fav_count"),
                F.col("p.comments").alias("comment_count"),
                F.col("p.views").alias("view_count"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("extra_data"),
        ordered_keywords(F.col("p.keywords")).alias("keywords"),
        F.array(file_struct).alias("files"),
    )


def submission_uploader_users(parsed: DataFrame, contributor_id: int, scan_time=None) -> DataFrame:
    """faexport.py:55-66: the uploader user snapshot emitted alongside."""
    rows = parsed.filter(F.col("p.error").isNull())
    scan = F.lit(scan_time).cast("timestamp") if scan_time else F.current_timestamp()
    return rows.select(
        F.lit(FA_SITE_ID).alias("website_id"),
        F.col("p.profile_name").alias("site_user_id"),
        scan.alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.lit(False).alias("is_deleted"),
        F.col("p.name").alias("display_name"),
        F.to_json(F.struct(F.col("p.avatar").alias("avatar_url"))).alias("extra_data"),
    )


def parse_user_payloads(payloads: DataFrame, payload_col: str = "payload") -> DataFrame:
    return payloads.select(F.from_json(payload_col, USER_PAYLOAD_SCHEMA).alias("p"))


def user_snapshots(parsed: DataFrame, contributor_id: int, scan_time=None) -> DataFrame:
    """faexport.py:74-152: disabled-account errors become is_deleted
    tombstones; normal payloads yield the full user snapshot plus
    watcher/watching stub snapshots (flat-map → explode + union)."""
    scan = F.lit(scan_time).cast("timestamp") if scan_time else F.current_timestamp()
    common = [
        F.lit(FA_SITE_ID).alias("website_id"),
        scan.alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
    ]

    tombstones = parsed.filter(
        F.col("p.error").startswith("User has disabled their account")
    ).select(
        common[0],
        id_from_url(F.col("p.url")).alias("site_user_id"),
        *common[1:],
        F.lit(True).alias("is_deleted"),
        F.lit(None).cast("string").alias("display_name"),
        F.lit(None).cast("string").alias("extra_data"),
    )

    ok = parsed.filter(F.col("p.error").isNull())
    watcher_structs = F.transform(
        F.col("p.watchers.recent"),
        lambda w: F.struct(
            w["profile_name"].alias("site_user_id"), w["name"].alias("display_name")
        ),
    )
    watching_structs = F.transform(
        F.col("p.watching.recent"),
        lambda w: F.struct(
            w["profile_name"].alias("site_user_id"), w["name"].alias("display_name")
        ),
    )
    main_users = ok.select(
        common[0],
        id_from_url(F.col("p.profile")).alias("site_user_id"),
        *common[1:],
        F.lit(False).alias("is_deleted"),
        F.col("p.name").alias("display_name"),
        F.to_json(
            F.struct(
                F.col("p.account_type").alias("account_type"),
                F.col("p.avatar").alias("avatar_url"),
                F.col("p.user_title").alias("user_title"),
                F.date_format(
                    F.try_to_timestamp(F.col("p.registered_at")), "yyyy-MM-dd'T'HH:mm:ssXXX"
                ).alias("registered_datetime"),
                F.col("p.guest_access").alias("guest_access"),
                F.col("p.current_mood").alias("current_mood"),
                F.col("p.artist_profile").alias("profile_html"),
                F.col("p.pageviews").alias("view_count"),
                F.col("p.submissions").alias("submission_count"),
                F.col("p.comments_received").alias("comments_received_count"),
                F.col("p.comments_given").alias("comments_given_count"),
                F.col("p.journals").alias("journal_count"),
                F.col("p.favorites").alias("favorite_count"),
                F.col("p.featured_submission.id").alias("featured_submission_id"),
                F.col("p.profile_id.id").alias("profile_id_submission_id"),
                F.col("p.artist_information").alias("artist_information"),
                F.col("p.contact_information").alias("contact_information"),
                F.col("p.watchers.count").alias("watchers_count"),
                F.col("p.watching.count").alias("watching_count"),
                watcher_structs.alias("watchers_recent"),
                watching_structs.alias("watching_recent"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("extra_data"),
    )

    stubs = (
        ok.select(
            F.explode(F.concat(watcher_structs, watching_structs)).alias("w")
        )
        .select(
            common[0],
            F.col("w.site_user_id").alias("site_user_id"),
            *common[1:],
            F.lit(False).alias("is_deleted"),
            F.col("w.display_name").alias("display_name"),
            F.lit(None).cast("string").alias("extra_data"),
        )
    )
    return tombstones.unionByName(main_users).unionByName(stubs)


def user_featured_submissions(
    parsed: DataFrame, contributor_id: int, scan_time=None
) -> DataFrame:
    """faexport.py:129-174: a user payload also yields up to two
    submission snapshots — the featured submission and the profile-id
    submission, each a thin stub (title + thumbnail file, keywords NOT
    recorded). Output is the nested snapshot shape ``explode_to_store``
    consumes (ingest/base.py NESTED_SUBMISSION_SCHEMA)."""
    ok = parsed.filter(F.col("p.error").isNull())
    scan = F.lit(scan_time).cast("timestamp") if scan_time else F.current_timestamp()
    featured = F.array(F.col("p.featured_submission"), F.col("p.profile_id"))
    exploded = ok.select(
        id_from_url(F.col("p.profile")).alias("uploader_site_user_id"),
        F.explode(F.filter(featured, lambda s: s.isNotNull() & s["id"].isNotNull())).alias("s"),
    )
    file_struct = F.struct(
        F.lit(None).cast("string").alias("site_file_id"),
        F.lit(None).cast("string").alias("file_url"),
        F.lit(None).cast("bigint").alias("file_size"),
        F.to_json(
            F.struct(F.col("s.thumbnail").alias("thumbnail_url")),
            {"ignoreNullFields": "false"},
        ).alias("extra_data"),
        F.lit([]).cast("array<struct<algo_id:bigint,hash_value:binary>>").alias("hashes"),
    )
    return exploded.select(
        F.lit(FA_SITE_ID).alias("website_id"),
        F.col("s.id").alias("site_submission_id"),
        scan.alias("scan_datetime"),
        F.lit(contributor_id).cast("bigint").alias("archive_contributor_id"),
        F.current_timestamp().alias("ingest_datetime"),
        F.col("uploader_site_user_id"),
        F.lit(False).alias("is_deleted"),
        F.col("s.title").alias("title"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("timestamp").alias("datetime_posted"),
        F.lit(None).cast("string").alias("extra_data"),
        F.lit(None).cast("array<struct<ordinal:int,keyword:string>>").alias("keywords"),
        F.array(file_struct).alias("files"),
    )
