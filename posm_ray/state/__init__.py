# state: checkpoint / lineage manifests for resumable runs
