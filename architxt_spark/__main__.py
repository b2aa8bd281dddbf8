from architxt_spark.cli import main

main()
