"""End-to-end ingest -> normalize: distributed REST fetch (fake
transport) -> from_json with pinned schema -> zoom pipeline tables.

The full replacement for the reference's loader+processor pair
(zoom_load.py + zoom_proc.py) in one lineage: urls fan out to
executors, bodies parse against plans/schemas, the normalization kit
shreds to the contract tables — no S3 landing hop needed for the
bytes to reach the engine (though write_parquet can persist the raw
bodies as a landing zone if wanted).
"""

import json

from pyspark.sql import Row, functions as F

from datalake_scripts_spark.operators.nested import explode_into, flatten
from datalake_scripts_spark.plans import schemas, zoom
from datalake_scripts_spark.sources.rest import distributed_fetch


def test_fetch_parse_normalize(spark):
    def api(url: str) -> bytes:
        # fully self-contained (cloudpickled by value to executors —
        # test modules aren't importable on workers)
        def _meeting(mid, uuid, n_recs):
            return {
                "account_id": "acc", "duration": 60, "host_email": "h@x.io",
                "host_id": "h", "id": mid, "recording_count": n_recs,
                "share_url": None, "start_time": "2023-05-01T09:00:00Z",
                "timezone": "UTC", "topic": f"Topic {mid}", "total_size": 1,
                "type": 2, "uuid": uuid,
                "recording_files": [
                    {"download_url": f"https://dl/{mid}/{i}", "file_extension": "MP4",
                     "file_size": 10, "file_type": "MP4", "id": f"r{mid}-{i}",
                     "meeting_id": uuid, "play_url": None,
                     "recording_start": "2023-05-01T10:00:00Z",
                     "recording_end": "2023-05-01T11:00:00Z",
                     "recording_type": "screen", "status": "completed"}
                    for i in range(n_recs)
                ],
            }

        page = int(url.rsplit("=", 1)[1])
        body = {
            "from": "2023-05-01", "to": "2023-05-02", "page_size": 2,
            "total_records": 2,
            "meetings": [_meeting(page * 10 + 1, f"u-{page}-1", 2),
                         _meeting(page * 10 + 2, f"u-{page}-2", 0)],
        }
        return json.dumps(body).encode()

    urls = spark.createDataFrame([Row(url=f"https://api/meetings?page={p}") for p in range(3)])
    fetched = distributed_fetch(urls, api)
    parsed = fetched.select(
        F.from_json("body", schemas.ZOOM_MEETINGS).alias("doc")
    ).select("doc.*")

    # same transform chain the zoom pipeline applies to file-sourced JSON
    meet = flatten(explode_into(parsed, "meetings", alias="meet"))
    assert meet.count() == 6
    meetings = meet.select(*zoom.MEETINGS_COLS)
    assert meetings.columns == zoom.MEETINGS_COLS
    recs = flatten(
        explode_into(meet, "meet_recording_files", carry=["meet_uuid", "meet_id"], alias="rec")
    )
    assert recs.count() == 6  # 3 pages x 1 meeting with 2 recordings
    assert recs.filter(F.col("rec_meeting_id") == F.col("meet_uuid")).count() == 6
