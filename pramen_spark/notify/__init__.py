from pramen_spark.notify.builder import (  # noqa: F401
    NotificationConfig,
    PipelineNotificationBuilder,
)
