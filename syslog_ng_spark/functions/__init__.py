"""Template-function library.

Every syslog-ng template function (reference: modules/basicfuncs/*.c,
lib/template/macros.c) is re-expressed as a thin wrapper over
``pyspark.sql.functions`` so it stays inside whole-stage codegen —
never a Python row UDF.
"""

from syslog_ng_spark.functions.strfuncs import (  # noqa: F401
    lowercase, uppercase, substr, strip, length, replace_delimiter,
    padding, indent_multi_line, sanitize, explode_str, implode,
)
from syslog_ng_spark.functions.numfuncs import (  # noqa: F401
    num_plus, num_minus, num_multi, num_div, num_mod, num_round,
    num_ceil, num_floor,
)
from syslog_ng_spark.functions.condfuncs import tf_if, tf_or, grep  # noqa: F401
from syslog_ng_spark.functions.listfuncs import (  # noqa: F401
    list_head, list_tail, list_nth, list_slice, list_count,
    list_append, list_concat,
)
from syslog_ng_spark.functions.ipfuncs import ipv4_to_int, in_netmask  # noqa: F401
from syslog_ng_spark.functions.hashfuncs import tf_md5, tf_sha1, tf_sha256, tf_hash, stable_uuid  # noqa: F401
from syslog_ng_spark.functions.fname import basename, dirname  # noqa: F401
from syslog_ng_spark.functions.urlfuncs import url_encode, url_decode, base64_encode, base64_decode  # noqa: F401
from syslog_ng_spark.functions.format import format_json, format_welf, format_csv  # noqa: F401
from syslog_ng_spark.functions import macros  # noqa: F401
