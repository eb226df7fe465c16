// Dump the reference's exact normalized kernel for a small fasta pair.
#include "fastsk_kernel.hpp"
#include "shared.h"
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <vector>
int main(int argc, char** argv) {
    int g = atoi(argv[3]), m = atoi(argv[4]);
    std::vector<std::vector<int>> seqs;
    std::map<char,int> vocab; vocab[0]=0;
    int n_train = 0;
    for (int f = 1; f <= 2; f++) {
        std::ifstream in(argv[f]);
        std::string line; bool label=true;
        while (std::getline(in, line)) {
            if (label) { label=false; continue; }
            std::vector<int> s;
            for (char c : line) { c = tolower(c);
                if (c=='\r') continue;
                if (!vocab.count(c)) vocab[c] = (int)vocab.size();
                s.push_back(vocab[c]); }
            seqs.push_back(s); label=true;
        }
        if (f==1) n_train = (int)seqs.size();
    }
    int nStr = (int)seqs.size();
    int dict_size = (int)vocab.size();
    int** S = (int**)malloc(nStr*sizeof(int*));
    std::vector<int> lens(nStr);
    for (int i=0;i<nStr;i++){ lens[i]=(int)seqs[i].size(); S[i]=seqs[i].data(); }
    Features* features = extractFeatures(S, lens, nStr, g);
    int k = g - m;
    int num_comb = (int)nchoosek(g, m);
    WorkItem *queue = new WorkItem[num_comb];
    for (int i=0;i<num_comb;i++){ queue[i].m=m; queue[i].combo_num=i; }
    kernel_params params;
    params.g=g; params.k=k; params.m=m;
    params.n_str_train=n_train; params.n_str_test=nStr-n_train;
    params.total_str=nStr; params.n_str_pairs=((long)nStr*(nStr+1))/2;
    params.features=features; params.dict_size=dict_size;
    params.num_threads=1; params.num_mutex=1;
    params.workQueue=queue; params.queueSize=num_comb;
    params.quiet=true; params.approx=false; params.delta=0.025;
    params.max_iters=-1; params.skip_variance=false;
    KernelFunction kf(&params);
    double* K = kf.compute_kernel();
    printf("n=%d dict=%d\n", nStr, dict_size);
    for (int i=0;i<nStr;i++){ for(int j=0;j<=i;j++) printf("%.17g ", tri_access(K,i,j)); printf("\n"); }
    return 0;
}
