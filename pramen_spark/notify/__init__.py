from pramen_spark.notify.builder import (  # noqa: F401
    NotificationConfig,
    PipelineNotificationBuilder,
)
from pramen_spark.notify.email import (  # noqa: F401
    AttachedFile,
    EmailConfig,
    EmailSender,
)
from pramen_spark.notify.targets import (  # noqa: F401
    FileNotificationTarget,
    HookConfig,
    LoggingNotificationTarget,
    NotificationTarget,
    PipelineInfo,
    PipelineNotificationTarget,
    load_notification_targets,
)
