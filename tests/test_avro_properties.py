"""Property tests: Avro spec codec round-trips arbitrary values.

Driver-side only (no SparkSession) so the search is fast; the
DataFrame-level path is covered in test_avro.py.
"""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pravega_spark.functions.avro_codec import AvroSchema

SCHEMA = AvroSchema(
    json.dumps(
        {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "l", "type": "long"},
                {"name": "i", "type": "int"},
                {"name": "d", "type": "double"},
                {"name": "b", "type": "boolean"},
                {"name": "s", "type": ["null", "string"]},
                {"name": "raw", "type": "bytes"},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "string"}},
            ],
        }
    )
)

values = st.fixed_dictionaries(
    {
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "d": st.floats(allow_nan=False),
        "b": st.booleans(),
        "s": st.none() | st.text(max_size=50),
        "raw": st.binary(max_size=50),
        "arr": st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=10),
        "m": st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=5),
    }
)


@settings(max_examples=300, deadline=None)
@given(values)
def test_round_trip(v):
    assert SCHEMA.decode(SCHEMA.encode(v)) == v


@settings(max_examples=100, deadline=None)
@given(st.floats())  # including nan/inf
def test_double_round_trip_bitexact(x):
    s = AvroSchema(json.dumps({"type": "record", "name": "D", "fields": [{"name": "d", "type": "double"}]}))
    out = s.decode(s.encode({"d": x}))["d"]
    assert math.isnan(out) if math.isnan(x) else out == x


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_zigzag_involution(n):
    s = AvroSchema('"long"')
    assert s.decode(s.encode(n)) == n