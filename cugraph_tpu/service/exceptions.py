"""Service error type.

ref: cugraph_service_client exceptions — server-side errors are caught and
wrapped so clients get clean, typed failures (SURVEY.md §5 failure
detection: "cugraph_service catches and wraps exceptions").
"""


class CugraphServiceError(RuntimeError):
    pass
