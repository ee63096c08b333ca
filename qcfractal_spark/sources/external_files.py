"""External files / dataset attachments — metadata table + blob
side-table (reference components/external_files/socket.py:31-372,
db_models.py ExternalFileORM, dataset attachments
dataset_socket.py:374-462, dataset_db_models.py:145-155).

The reference stores bytes in S3 (multipart upload, sha256 + size
computed while streaming) and the metadata row in Postgres with a
two-phase status: the row is visible as ``processing`` while the upload
runs, then flips to ``available`` with the digest and size filled in —
a failed upload leaves a diagnosable row instead of a dangling object.

Spark-first mapping: the "bucket" is a blob SIDE-TABLE (object_key →
binary content), the S11 pattern the multimodal family already proves
out — at scale that's a parquet/object-store table whose rows are the
objects, and the presigned-URL arm becomes a path/URI the caller
streams from.  The metadata table is a MutableTable with the same
two-phase status contract.  Digests and sizes are computed ENGINE-SIDE
(``sha2``/``length`` in the scan, codegen) — the bulk-attach arm
ingests a whole DataFrame of attachments in ONE commit pair instead of
the reference's per-file upload loop.

Metadata schema (``bucket``/``object_key`` are the reference's
client-excluded columns; ``dataset_id``/``attachment_type`` are the
DatasetAttachmentORM polymorphic arm, NULL for plain external files):

``file_id long, file_type string, created_on long, status string,
file_name string, description string, provenance string,
sha256sum string, file_size long, bucket string, object_key string,
dataset_id long, attachment_type string``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import MutableTable
from ..session import local_df

METADATA_SCHEMA = (
    "file_id long, file_type string, created_on long, status string, "
    "file_name string, description string, provenance string, "
    "sha256sum string, file_size long, bucket string, object_key string, "
    "dataset_id long, attachment_type string"
)
BLOB_SCHEMA = "object_key string, content binary"
_META_COLS = [c.strip().split()[0] for c in METADATA_SCHEMA.split(",")]


class MissingFileError(KeyError):
    """MissingDataError analog for absent file ids."""


class ExternalFileStore:
    def __init__(self, spark: SparkSession, path: str, bucket: str = "qcf-files"):
        self.spark = spark
        self.bucket = bucket
        self.metadata = MutableTable(spark, f"{path}/metadata")
        self.blobs = MutableTable(spark, f"{path}/blobs")

    def init(self) -> None:
        self.metadata.overwrite(local_df(self.spark, [], METADATA_SCHEMA))
        self.blobs.overwrite(local_df(self.spark, [], BLOB_SCHEMA))

    # -- ingest ---------------------------------------------------------------

    def attach_many(
        self,
        files: DataFrame,
        now: int,
        file_type: str = "dataset_attachment",
    ) -> int:
        """Bulk attach: one commit pair for a whole DataFrame of files —
        the set-oriented form of the reference's add_data loop.

        ``files`` carries ``file_id, file_name, description, provenance,
        content binary`` plus optional ``dataset_id, attachment_type``.
        sha256/size are computed scan-side; object keys are
        deterministic (``obj-{file_id}`` — the reference uses uuid4,
        which exists to avoid S3 key collisions; a keyed table gets that
        from the primary key itself).  Rows land directly as
        ``available`` because blobs commit first — the two-phase
        ``processing`` window only exists for the streaming single-file
        arm below."""
        cols = files.columns
        okey = F.concat(F.lit("obj-"), F.col("file_id").cast("string"))
        blob_rows = files.select(
            okey.alias("object_key"), F.col("content").cast("binary").alias("content")
        ).localCheckpoint(eager=True)
        n = blob_rows.count()
        meta_rows = files.select(
            F.col("file_id").cast("long"),
            F.lit(file_type).alias("file_type"),
            F.lit(int(now)).cast("long").alias("created_on"),
            F.lit("available").alias("status"),
            "file_name",
            "description",
            "provenance",
            F.sha2(F.col("content").cast("binary"), 256).alias("sha256sum"),
            F.length(F.col("content").cast("binary")).cast("long").alias("file_size"),
            F.lit(self.bucket).alias("bucket"),
            okey.alias("object_key"),
            (
                F.col("dataset_id").cast("long")
                if "dataset_id" in cols
                else F.lit(None).cast("long")
            ).alias("dataset_id"),
            (
                F.col("attachment_type")
                if "attachment_type" in cols
                else F.lit(None).cast("string")
            ).alias("attachment_type"),
        ).localCheckpoint(eager=True)
        self.blobs.append(blob_rows)
        self.metadata.append(meta_rows)
        return n

    def add_data(
        self,
        content: bytes,
        file_name: str,
        now: int,
        file_type: str = "external_file",
        description: str = "",
        provenance: str = "{}",
        dataset_id: int | None = None,
        attachment_type: str | None = None,
    ) -> int:
        """Single-file arm with the reference's two-phase status: the
        metadata row commits as ``processing`` (empty digest), the blob
        lands, then the row flips to ``available`` with sha256/size — a
        crash between the commits leaves the diagnosable processing row,
        exactly the reference's contract (socket.py:128-166)."""
        import hashlib

        ids = [r["file_id"] for r in self.metadata.read().select("file_id").collect()]
        file_id = max(ids, default=0) + 1
        okey = f"obj-{file_id}"
        row = local_df(self.spark,
            [
                (
                    file_id, file_type, int(now), "processing", file_name,
                    description, provenance, "", 0, self.bucket, okey,
                    dataset_id, attachment_type,
                )
            ],
            METADATA_SCHEMA,
        )
        self.metadata.append(row)
        blob = local_df(self.spark, [(okey, bytearray(content))], BLOB_SCHEMA)
        self.blobs.append(blob)
        sha = hashlib.sha256(content).hexdigest()
        size = len(content)
        hit = F.col("file_id") == file_id

        def finalize(df: DataFrame) -> DataFrame:
            return (
                df.withColumn(
                    "status", F.when(hit, F.lit("available")).otherwise(F.col("status"))
                )
                .withColumn(
                    "sha256sum", F.when(hit, F.lit(sha)).otherwise(F.col("sha256sum"))
                )
                .withColumn(
                    "file_size",
                    F.when(hit, F.lit(size).cast("long")).otherwise(F.col("file_size")),
                )
            )

        self.metadata.transform(finalize)
        return file_id

    # -- reads ----------------------------------------------------------------

    def get_metadata(self, file_id: int) -> dict:
        """Client metadata dict — bucket/object_key excluded, mirroring
        ExternalFileORM._qcportal_model_excludes."""
        rows = self.metadata.read().where(F.col("file_id") == int(file_id)).collect()
        if not rows:
            raise MissingFileError(
                f"Cannot find external file with id {file_id} in the database"
            )
        d = rows[0].asDict()
        d.pop("bucket", None)
        d.pop("object_key", None)
        return d

    def get_attachments(self, dataset_id: int) -> DataFrame:
        """All attachment metadata rows of one dataset
        (dataset_socket.py:374-385)."""
        return self.metadata.read().where(
            F.col("dataset_id") == int(dataset_id)
        )

    def get_url(self, file_id: int) -> tuple[str, str]:
        """(file_name, direct URI) — the presigned-URL analog: a path the
        caller can stream from without the metadata table."""
        rows = self.metadata.read().where(F.col("file_id") == int(file_id)).collect()
        if not rows:
            raise MissingFileError(
                f"Cannot find external file with id {file_id} in the database"
            )
        r = rows[0]
        return r["file_name"], f"table://{self.bucket}/{r['object_key']}"

    def read_file(self, file_id: int) -> bytes:
        """get_file_streamer analog: the blob bytes by id."""
        rows = self.metadata.read().where(F.col("file_id") == int(file_id)).collect()
        if not rows:
            raise MissingFileError(
                f"Cannot find external file with id {file_id} in the database"
            )
        blob = (
            self.blobs.read()
            .where(F.col("object_key") == rows[0]["object_key"])
            .collect()
        )
        return bytes(blob[0]["content"])

    # -- deletes ---------------------------------------------------------------

    def delete(self, file_ids) -> int:
        """Remove metadata rows then their blobs (the reference deletes
        the row, flushes, then the S3 object — same order here so a
        crash strands only unreferenced blobs, never dangling metadata).
        Missing ids raise, matching MissingDataError."""
        ids = [int(i) for i in (file_ids if hasattr(file_ids, "__iter__") else [file_ids])]
        rows = self.metadata.read().where(F.col("file_id").isin(ids)).collect()
        found = {r["file_id"] for r in rows}
        missing = [i for i in ids if i not in found]
        if missing:
            raise MissingFileError(
                f"Cannot find external file with id {missing[0]} in the database"
            )
        keys = [r["object_key"] for r in rows]
        id_cond = F.col("file_id").isin(ids)
        key_cond = F.col("object_key").isin(keys)
        self.metadata.transform(lambda df: df.where(~id_cond))
        self.blobs.transform(lambda df: df.where(~key_cond))
        return len(ids)

    def delete_attachment(self, dataset_id: int, file_id: int) -> None:
        """Dataset-scoped delete (dataset_socket.py:386-399): the file
        must be an attachment OF THAT dataset."""
        hit = (
            self.metadata.read()
            .where(
                (F.col("file_id") == int(file_id))
                & (F.col("dataset_id") == int(dataset_id))
            )
            .count()
        )
        if hit == 0:
            raise MissingFileError(
                f"Attachment with file id {file_id} not found in dataset {dataset_id}"
            )
        self.delete([file_id])
