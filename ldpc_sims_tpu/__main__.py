from ldpc_sims_tpu.cli.main import main

main()
