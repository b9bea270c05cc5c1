from .pipeline import windowed_traffic, sessionized_traffic
from .kinesis_sink import KinesisBatchWriter, ThrottlingKinesisStub
from .audit import JobAuditListener

__all__ = [
    "windowed_traffic",
    "sessionized_traffic",
    "KinesisBatchWriter",
    "ThrottlingKinesisStub",
    "JobAuditListener",
]
