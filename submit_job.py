"""spark-submit driver file.

    spark-submit --py-files dist/pgs_spark.zip submit_job.py pagerank \
        --edges s3://bucket/edges --out s3://bucket/ranks \
        --checkpoint-dir s3://bucket/ck --tol 1e-6
"""

from pgs_spark.cli import main

if __name__ == "__main__":
    main()
