"""Object-store connector (ref makani/utils/dataloaders/aws_connector.py:19-120).

Lists and fetches dataset files from S3-compatible object storage so the
multifiles dataset can stage remote HDF5 files to local scratch before
training. boto3 is not part of the TPU image (and this environment has no
network egress), so construction is import-gated with a clear error; the
interface matches the reference's AWSConnector (list_bucket / download_files).
"""

from __future__ import annotations

import os
from typing import List, Union

__all__ = ["ObjectStoreConnector"]


class ObjectStoreConnector:
    def __init__(self, region_name: str = "us-east-1", endpoint_url: str | None = None, anonymous: bool = False):
        try:
            import boto3
            from botocore import UNSIGNED
            from botocore.config import Config
        except ImportError as e:
            raise ImportError(
                "ObjectStoreConnector needs boto3, which is not installed in this "
                "environment. Stage dataset files to local disk instead."
            ) from e
        config = Config(signature_version=UNSIGNED) if anonymous else None
        self._client = boto3.client("s3", region_name=region_name, endpoint_url=endpoint_url, config=config)

    def list_bucket(self, paths: Union[str, List[str]]) -> List[str]:
        """Expand s3://bucket/prefix paths into full key listings."""
        if isinstance(paths, str):
            paths = [paths]
        keys = []
        for path in paths:
            bucket, _, prefix = path.removeprefix("s3://").partition("/")
            token = None
            while True:
                kw = dict(Bucket=bucket, Prefix=prefix)
                if token:
                    kw["ContinuationToken"] = token
                resp = self._client.list_objects_v2(**kw)
                keys += [f"s3://{bucket}/{o['Key']}" for o in resp.get("Contents", [])]
                token = resp.get("NextContinuationToken")
                if not token:
                    break
        return keys

    def download_files(self, paths: Union[str, List[str]], target_dir: str) -> List[str]:
        """Fetch objects to target_dir; returns local paths."""
        if isinstance(paths, str):
            paths = [paths]
        os.makedirs(target_dir, exist_ok=True)
        out = []
        for path in paths:
            bucket, _, key = path.removeprefix("s3://").partition("/")
            local = os.path.join(target_dir, os.path.basename(key))
            if not os.path.isfile(local):
                self._client.download_file(bucket, key, local)
            out.append(local)
        return out
