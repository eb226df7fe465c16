// Timing driver for the reference FastSK kernel engine (single thread).
// Links against the unmodified reference sources; used only to measure
// the baseline wall-clock per counting pass.
#include "fastsk_kernel.hpp"
#include "shared.h"
#include <cstdio>
#include <cstring>
#include <chrono>
#include <fstream>
#include <map>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 6) { fprintf(stderr, "usage: %s train.fasta test.fasta g m max_iters\n", argv[0]); return 1; }
    int g = atoi(argv[3]), m = atoi(argv[4]), max_iters = atoi(argv[5]);
    std::vector<std::vector<int>> seqs;
    std::map<char,int> vocab; vocab[0]=0;
    int n_train = 0;
    for (int f = 1; f <= 2; f++) {
        std::ifstream in(argv[f]);
        std::string line; bool label=true;
        while (std::getline(in, line)) {
            if (label) { label=false; continue; }
            std::vector<int> s;
            for (char c : line) {
                c = tolower(c);
                if (!vocab.count(c)) vocab[c] = (int)vocab.size();
                s.push_back(vocab[c]);
            }
            seqs.push_back(s);
            label=true;
        }
        if (f==1) n_train = (int)seqs.size();
    }
    int nStr = (int)seqs.size();
    int dict_size = (int)vocab.size();
    printf("nStr=%d n_train=%d dict=%d\n", nStr, n_train, dict_size);
    int** S = (int**)malloc(nStr*sizeof(int*));
    std::vector<int> lens(nStr);
    for (int i=0;i<nStr;i++){ lens[i]=(int)seqs[i].size(); S[i]=seqs[i].data(); }
    Features* features = extractFeatures(S, lens, nStr, g);
    printf("nfeat=%d\n", features->n);
    int k = g - m;
    int num_comb = (int)nchoosek(g, m);
    WorkItem *queue = new WorkItem[num_comb];
    for (int i=0;i<num_comb;i++){ queue[i].m=m; queue[i].combo_num=i; }
    kernel_params params;
    params.g=g; params.k=k; params.m=m;
    params.n_str_train=n_train; params.n_str_test=nStr-n_train;
    params.total_str=nStr;
    params.n_str_pairs=((long)nStr*(nStr+1))/2;
    params.features=features; params.dict_size=dict_size;
    params.num_threads=1; params.num_mutex=1;
    params.workQueue=queue; params.queueSize=num_comb;
    params.quiet=true; params.approx=true; params.delta=0.025;
    params.max_iters=max_iters; params.skip_variance=true;
    KernelFunction kf(&params);
    auto t0 = std::chrono::steady_clock::now();
    double* K = kf.compute_kernel();
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1-t0).count();
    printf("passes=%d wall=%.3f s per_pass=%.4f s total_extrapolated_%d=%.1f s\n",
           max_iters, secs, secs/max_iters, num_comb, secs/max_iters*num_comb);
    printf("K[0]=%f K[1]=%f\n", K[0], tri_access(K, 0, 1));
    return 0;
}
