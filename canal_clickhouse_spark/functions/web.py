"""§2-H extension — URL / encoding / geo scalar packs (ClickHouse parity).

ClickHouse ships dedicated URL functions (``domain``, ``path``,
``queryString``, ``extractURLParameter``, ``cutToFirstSignificantSubdomain``),
encoding functions (``base64Encode/Decode``, ``hex/unhex``, ``bin``), and geo
functions (``greatCircleDistance``/``geoDistance``) — reference identity
/root/reference/README.md:1; semantics are the public ClickHouse function
surface [P-ch].

The fixtures carry no natural URLs or coordinates, so each pack synthesizes
its inputs deterministically from fixture columns with the IDENTICAL
expression in Spark and in the DuckDB oracle — the functions under test are
the parse/encode/distance calls, and every output column is hash-checked.

All JVM-side builtins inside whole-stage codegen; one narrow projection per
pack, no shuffles except the final presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_url",
    oracle=r"""
    WITH u AS (
        SELECT doc_id,
               concat('https://', source, '.example.com/docs/',
                      CAST(doc_id AS VARCHAR), '?lang=', lang,
                      '&n=', CAST(n_chars AS VARCHAR),
                      '#f', CAST(doc_id % 7 AS VARCHAR)) AS url
        FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\?([^#]*)', 1) AS qs,
           regexp_extract(url, '#(.*)$', 1) AS frag,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS p_lang,
           regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                          '([^.]+\.[^.]+)$', 1) AS sig_domain
    FROM u ORDER BY doc_id
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL pack: protocol/host/path/query/fragment/parameter extraction
    (CH ``protocol``/``domain``/``path``/``queryString``/``fragment``/
    ``extractURLParameter``) via Spark's ``parse_url``, plus
    ``cutToFirstSignificantSubdomain`` as a regex over the parsed host.

    The oracle parses the same synthesized URL with regexes — two
    independent implementations of the same contract, hash-matched.
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
        F.lit("#f"),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    part = lambda p: F.parse_url(F.col("url"), F.lit(p))  # noqa: E731
    return u.select(
        "doc_id",
        part("PROTOCOL").alias("proto"),
        part("HOST").alias("host"),
        part("PATH").alias("path"),
        part("QUERY").alias("qs"),
        part("REF").alias("frag"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("p_lang"),
        F.regexp_extract(part("HOST"), r"([^.]+\.[^.]+)$", 1).alias("sig_domain"),
    ).orderBy("doc_id")


@query(
    "fn_encoding",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 16))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 16))))) AS b64_rt,
           hex(lang) AS hx,
           decode(unhex(hex(lang))) AS hx_rt,
           ascii(substr(source, 1, 1)) AS a0,
           chr(65 + CAST(doc_id % 26 AS INT)) AS ch,
           bin(n_chars) AS bn
    FROM documents ORDER BY doc_id
    """,
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding pack: base64 encode + decode round-trip, hex/unhex round-trip,
    ascii/chr, integer binary repr (CH ``base64Encode``/``base64Decode``,
    ``hex``/``unhex``, ``bin``).
    """
    d = table(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 16).cast("binary")
    return d.select(
        "doc_id",
        F.base64(prefix).alias("b64"),
        F.decode(F.unbase64(F.base64(prefix)), "utf-8").alias("b64_rt"),
        F.hex(F.col("lang")).alias("hx"),
        F.decode(F.unhex(F.hex(F.col("lang"))), "utf-8").alias("hx_rt"),
        F.ascii(F.substring("source", 1, 1)).alias("a0"),
        F.expr("chr(65 + CAST(doc_id % 26 AS INT))").alias("ch"),
        F.bin("n_chars").alias("bn"),
    ).orderBy("doc_id")


@query(
    "fn_geo",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 160) - 80 + 0.5 AS lat1,
               ((c_custkey * 7) % 360) - 180 + 0.5 AS lon1,
               (c_nationkey % 160) - 80 + 0.5 AS lat2,
               ((c_nationkey * 11) % 360) - 180 + 0.5 AS lon2
        FROM customer)
    SELECT c_custkey,
           CAST(ROUND(2 * 6371.0088 * asin(sqrt(
                pow(sin(radians(lat2 - lat1) / 2), 2)
                + cos(radians(lat1)) * cos(radians(lat2))
                  * pow(sin(radians(lon2 - lon1) / 2), 2))), 0) AS BIGINT)
             AS dist_km,
           CAST(floor(lat1 / 10) AS INT) AS cell_lat,
           CAST(floor(lon1 / 10) AS INT) AS cell_lon,
           lat1 BETWEEN -60 AND 60 AND lon1 BETWEEN -90 AND 90 AS in_bbox
    FROM pts ORDER BY c_custkey
    """,
)
def fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo pack: great-circle (haversine) distance, grid-cell id, bounding
    box (CH ``greatCircleDistance``/``geoDistance``, ``pointInRect``-style
    filters, simplified geohash cell).

    Coordinates are synthesized on a 0.5-degree offset grid so cell floors
    are exact; the haversine result is rounded to integer km because libm
    transcendentals differ by ulps across runtimes (same rule as fn_math's
    6dp — here absolute error ~1e-6 km makes integer rounding flip-proof).
    At 100 TB this is a pure map-side projection — no shuffle at all.
    """
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 160) - 80 + 0.5).alias("lat1"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).alias("lon1"),
        ((F.col("c_nationkey") % 160) - 80 + 0.5).alias("lat2"),
        (((F.col("c_nationkey") * 11) % 360) - 180 + 0.5).alias("lon2"),
    )
    hav = (
        2
        * 6371.0088
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat2") - F.col("lat1")) / 2), 2)
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.pow(F.sin(F.radians(F.col("lon2") - F.col("lon1")) / 2), 2)
            )
        )
    )
    return pts.select(
        "c_custkey",
        F.round(hav, 0).cast("long").alias("dist_km"),
        F.floor(F.col("lat1") / 10).cast("int").alias("cell_lat"),
        F.floor(F.col("lon1") / 10).cast("int").alias("cell_lon"),
        (
            F.col("lat1").between(-60, 60) & F.col("lon1").between(-90, 90)
        ).alias("in_bbox"),
    ).orderBy("c_custkey")


@query(
    "fn_ip",
    oracle="""
    WITH addr AS (
        SELECT event_id,
               10 * 16777216 + (user_id % 256) * 65536
                 + ((event_id // 256) % 256) * 256 + event_id % 256 AS num,
               user_id
        FROM events
    )
    SELECT event_id, num,
           (num // 16777216) || '.' || ((num // 65536) % 256) || '.'
             || ((num // 256) % 256) || '.' || (num % 256) AS ip,
           num // 256 AS subnet24,
           (num // 65536) = 10 * 256 + 5 AS in_10_5_16,
           (num // 16777216) = 10 AS is_private
    FROM addr ORDER BY event_id
    """,
)
def fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH IP function pack on a deterministically derived address per event:
    ``IPv4NumToString`` (octet join), ``IPv4StringToNum`` (the `num` column
    is the round-trip anchor), ``isIPAddressInRange(ip, '10.5.0.0/16')``
    (prefix compare via shift), RFC1918 check (first octet).

    Pure integer shift/mask arithmetic — whole-stage codegen, no UDF; CIDR
    membership is one shift + one equality, which is also the right
    partition-pruning form for ip-keyed tables at scale.
    """
    e = table(spark, sf_dir, "events")
    addr = e.select(
        "event_id",
        (
            F.lit(10 * 16777216)
            + (F.col("user_id") % 256) * 65536
            + (F.expr("event_id div 256") % 256) * 256
            + F.col("event_id") % 256
        ).alias("num"),
    )
    return addr.select(
        "event_id",
        "num",
        F.concat_ws(
            ".",
            F.shiftright("num", 24).cast("string"),
            (F.shiftright("num", 16) % 256).cast("string"),
            (F.shiftright("num", 8) % 256).cast("string"),
            (F.col("num") % 256).cast("string"),
        ).alias("ip"),
        F.shiftright("num", 8).cast("bigint").alias("subnet24"),
        (F.shiftright("num", 16) == 10 * 256 + 5).alias("in_10_5_16"),
        (F.shiftright("num", 24) == 10).alias("is_private"),
    ).orderBy("event_id")
