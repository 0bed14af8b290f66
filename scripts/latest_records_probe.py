import json, os, sys, time
sys.path.insert(0, "/root/repo")
sf_dir, out_path = sys.argv[1], sys.argv[2]
from pywrangler_spark.session import get_spark
from pywrangler_spark.queries.temporal import latest_event_per_user
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("latest-records-probe", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus),
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
import bench
read_stages = bench._stage_metrics_reader(spark)
t0 = time.perf_counter()
latest_event_per_user(spark, sf_dir).write.format("noop").mode("overwrite").save()
elapsed = time.perf_counter() - t0
time.sleep(0.5)
snap = read_stages() or {}
stages = [{
    "stage": sid, "tasks": s.get("numTasks"),
    "input_records": s.get("inputRecords"),
    "sh_w_records": s.get("shuffleWriteRecords"),
    "sh_w_mb": round(s.get("shuffleWriteBytes", 0)/2**20, 1),
    "sh_r_records": s.get("shuffleReadRecords"),
} for sid, s in sorted(snap.items())]
json.dump({"sf_dir": sf_dir, "wall_s": round(elapsed, 2),
           "stages": stages}, open(out_path, "w"), indent=1)
