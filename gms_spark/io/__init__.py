from gms_spark.io.readers import read_edge_list  # noqa: F401
from gms_spark.io.tableio import TableIO  # noqa: F401
