"""Pipeline-metrics module: batched re-implementation of the reference's
``dst_metrics`` (``modules/dst_metrics/*.py``)."""
